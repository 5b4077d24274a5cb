"""crawl4ai_ray — Ray-Data-native crawl-and-extract engine."""
