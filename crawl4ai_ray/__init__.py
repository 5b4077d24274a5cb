"""crawl4ai_ray — a Ray-Data-native crawl-and-extract engine.

From-scratch rebuild of the capabilities of Aitosoft/crawl4ai (the
reference engine's public surface: crawl4ai/__init__.py:114-208) on
``ray.data.Dataset`` pipelines: zero-copy Arrow ``map_batches``
stages, actor-pool shards for crawl state (URL-seen, politeness),
groupby/sort shuffles for the wide steps.

Public API (grouped like the reference's exports):
"""

# extraction kernel + strategies
from .stages.extract import ExtractBatch, extract_batch, scrape_page
from .stages.json_extract import (
    JsonCssExtractionStrategy,
    JsonXPathExtractionStrategy,
    json_extract_batch,
)
from .stages.regex_extract import Pattern as RegexPattern
from .stages.regex_extract import RegexExtractor

# markdown + content filters
from .functions.markdown import (
    MarkdownResult,
    convert_links_to_citations,
    generate_markdown,
    html_to_markdown,
)
from .functions.md_engine import MarkdownEmitter
from .stages.content_filters import BM25ContentFilter, BM25Okapi, PruningContentFilter

# chunking
from .functions.chunking import (
    ChunkingStrategy,
    FixedLengthWordChunking,
    IdentityChunking,
    NlpSentenceChunking,
    OverlappingWindowChunking,
    RegexChunking,
    SlidingWindowChunking,
    TopicSegmentationChunking,
    merge_chunks,
)

# url functions / filters / scorers
from .functions.urls import (
    efficient_normalize_url_for_deep_crawl,
    get_base_domain,
    is_external_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)
from .functions.url_filters import (
    ContentTypeFilter,
    DomainFilter,
    FilterChain,
    URLPatternFilter,
)
from .functions.url_scorers import (
    CompositeScorer,
    ContentTypeScorer,
    DomainAuthorityScorer,
    FreshnessScorer,
    KeywordRelevanceScorer,
    PathDepthScorer,
    URLScorer,
)
from .functions.page_utils import (
    calculate_link_intrinsic_score,
    compute_head_fingerprint,
    preprocess_html_for_schema,
    quick_extract_links,
)

# crawl engines + state
from .pipelines.crawl import BFSCrawler, run_fetch_extract_wave
from .pipelines.strategies import BestFirstCrawler, DFSCrawler
from .state.filters import BloomFilter, CuckooFilter
from .state.politeness import PolitenessPool, PolitenessShard
from .state.seen import SeenShard, ShardedSeen

# sources & sinks
from .sources.corpus import build_corpus, seed_urls
from .sources.seeder import parse_sitemap, seed_union
from .sources.sinks import export_by_host

# adaptive / hub / cache
from .pipelines.adaptive import AdaptiveConfig, AdaptiveCrawler, AdaptiveState
from .pipelines.cache import (
    CacheMode,
    CacheValidationResult,
    read_cached_results,
    revalidate_cached,
    split_cached,
)
from .pipelines import hub

# training-data ops
from .pipelines.dedup import (
    cluster_pairs_distributed,
    verify_pairs_jaccard,
    embedding_near_pairs,
    embedding_near_pairs_lsh,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from .pipelines.similarity import brute_topk, ivf_topk, lsh_topk
from .pipelines.windows import sessionize, tumbling_window_agg
from .functions.sketches import approx_distinct

# extraction stages
from .stages.cosine_extract import CosineClusterExtract
from .stages.llm import LLMContentFilterStage, LLMExtractionStage
from .stages.multimodal import (
    AudioFeatureStage,
    ImageFeatureStage,
    VideoFrameSampleStage,
)
from .stages.pdf_extract import PdfExtractStage

__version__ = "0.1.0"
