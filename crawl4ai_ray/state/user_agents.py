"""User-agent generation and rotation — reference
``user_agent_generator.py:143-428`` (``UserAgentGenerator``), the
fetch-header realism companion to proxy rotation (state/proxies.py).

The reference draws from the global ``random`` module; here the RNG is
injectable (defaults to a seeded ``random.Random`` so distributed
fetch tasks are deterministic and replayable). Catalog contents and
draw ORDER are identical to the reference — the differential parity
suite (tests/test_user_agents.py) seeds global ``random``, passes it
as the rng, and compares against the loaded reference class
draw-for-draw.

Rotation: ``UserAgentRotator`` gives sticky per-session (per-host)
assignment with the same vectorized batch shape as
``assign_round_robin`` — the fetch seam attaches one UA per host so a
multi-wave crawl presents a stable identity to each site.
"""

from __future__ import annotations

import random
import re
from typing import Dict, List, Optional

DESKTOP_PLATFORMS = {
    "windows": {
        "10_64": "(Windows NT 10.0; Win64; x64)",
        "10_32": "(Windows NT 10.0; WOW64)",
    },
    "macos": {
        "intel": "(Macintosh; Intel Mac OS X 10_15_7)",
        "newer": "(Macintosh; Intel Mac OS X 10.15; rv:109.0)",
    },
    "linux": {
        "generic": "(X11; Linux x86_64)",
        "ubuntu": "(X11; Ubuntu; Linux x86_64)",
        "chrome_os": "(X11; CrOS x86_64 14541.0.0)",
    },
}

MOBILE_PLATFORMS = {
    "android": {
        "samsung": "(Linux; Android 13; SM-S901B)",
        "pixel": "(Linux; Android 12; Pixel 6)",
        "oneplus": "(Linux; Android 13; OnePlus 9 Pro)",
        "xiaomi": "(Linux; Android 12; M2102J20SG)",
    },
    "ios": {
        "iphone": "(iPhone; CPU iPhone OS 16_5 like Mac OS X)",
        "ipad": "(iPad; CPU OS 16_5 like Mac OS X)",
    },
}

BROWSER_COMBINATIONS = {
    1: [["chrome"], ["firefox"], ["safari"], ["edge"]],
    2: [["gecko", "firefox"], ["chrome", "safari"], ["webkit", "safari"]],
    3: [["chrome", "safari", "edge"], ["webkit", "chrome", "safari"]],
}

RENDERING_ENGINES = {
    "chrome_webkit": "AppleWebKit/537.36",
    "safari_webkit": "AppleWebKit/605.1.15",
    "gecko": ["Gecko/20100101", "Gecko/20100101", "Gecko/2010010"],
}

CHROME_VERSIONS = [
    "Chrome/119.0.6045.199",
    "Chrome/118.0.5993.117",
    "Chrome/117.0.5938.149",
    "Chrome/116.0.5845.187",
    "Chrome/115.0.5790.171",
]

EDGE_VERSIONS = [
    "Edg/119.0.2151.97",
    "Edg/118.0.2088.76",
    "Edg/117.0.2045.47",
    "Edg/116.0.1938.81",
    "Edg/115.0.1901.203",
]

SAFARI_VERSIONS = [
    "Safari/537.36",
    "Safari/605.1.15",
    "Safari/604.1",
    "Safari/602.1",
    "Safari/601.5.17",
]

FIREFOX_VERSIONS = [
    "Firefox/119.0",
    "Firefox/118.0.2",
    "Firefox/117.0.1",
    "Firefox/116.0",
    "Firefox/115.0.3",
    "Firefox/114.0.2",
    "Firefox/113.0.1",
    "Firefox/112.0",
    "Firefox/111.0.1",
    "Firefox/110.0",
]

_UA_BROWSER_PATTERNS = {
    "chrome": r"Chrome/(\d+)",
    "edge": r"Edg/(\d+)",
    "safari": r"Version/(\d+)",
    "firefox": r"Firefox/(\d+)",
}


class UserAgentGenerator:
    """Reference ``UserAgentGenerator`` with an injectable RNG (the
    reference reads the global ``random`` module; draw order is kept
    identical so seeding global random and passing it as ``rng``
    reproduces the reference byte-for-byte)."""

    def __init__(self, rng: Optional[random.Random] = None, seed: int = 0):
        self.rng = rng if rng is not None else random.Random(seed)
        self.desktop_platforms = DESKTOP_PLATFORMS
        self.mobile_platforms = MOBILE_PLATFORMS
        self.browser_combinations = BROWSER_COMBINATIONS
        self.rendering_engines = RENDERING_ENGINES
        self.chrome_versions = CHROME_VERSIONS
        self.edge_versions = EDGE_VERSIONS
        self.safari_versions = SAFARI_VERSIONS
        self.firefox_versions = FIREFOX_VERSIONS

    def get_browser_stack(self, num_browsers: int = 1) -> List[str]:
        """Reference :261-298: pick a combination, then one version
        per member (same draw order)."""
        if num_browsers not in self.browser_combinations:
            raise ValueError(f"Unsupported number of browsers: {num_browsers}")
        combination = self.rng.choice(self.browser_combinations[num_browsers])
        stack = []
        for browser in combination:
            if browser == "chrome":
                stack.append(self.rng.choice(self.chrome_versions))
            elif browser == "firefox":
                stack.append(self.rng.choice(self.firefox_versions))
            elif browser == "safari":
                stack.append(self.rng.choice(self.safari_versions))
            elif browser == "edge":
                stack.append(self.rng.choice(self.edge_versions))
            elif browser == "gecko":
                stack.append(self.rng.choice(self.rendering_engines["gecko"]))
            elif browser == "webkit":
                stack.append(self.rendering_engines["chrome_webkit"])
        return stack

    def get_random_platform(self, device_type, os_type, device_brand) -> str:
        """Reference :350-369 (same dict-merge + choice order)."""
        platforms = (
            self.desktop_platforms
            if device_type == "desktop"
            else self.mobile_platforms
            if device_type == "mobile"
            else {**self.desktop_platforms, **self.mobile_platforms}
        )
        if os_type:
            for group in [self.desktop_platforms, self.mobile_platforms]:
                if os_type in group:
                    platforms = {os_type: group[os_type]}
                    break
        os_key = self.rng.choice(list(platforms.keys()))
        if device_brand and device_brand in platforms[os_key]:
            return platforms[os_key][device_brand]
        return self.rng.choice(list(platforms[os_key].values()))

    def generate(
        self,
        device_type: Optional[str] = None,
        os_type: Optional[str] = None,
        device_brand: Optional[str] = None,
        browser_type: Optional[str] = None,
        num_browsers: int = 3,
    ) -> str:
        """Reference :299-342 — platform, legacy token, browser stack."""
        platform = self.get_random_platform(device_type, os_type, device_brand)
        components = ["Mozilla/5.0", platform]
        browser_stack = self.get_browser_stack(num_browsers)
        if "Firefox" in str(browser_stack) or browser_type == "firefox":
            components.append(self.rng.choice(self.rendering_engines["gecko"]))
        elif (
            "Chrome" in str(browser_stack)
            or "Safari" in str(browser_stack)
            or browser_type == "chrome"
        ):
            components.append(self.rendering_engines["chrome_webkit"])
            components.append("(KHTML, like Gecko)")
        elif "Edge" in str(browser_stack) or browser_type == "edge":
            components.append(self.rendering_engines["safari_webkit"])
            components.append("(KHTML, like Gecko)")
        elif "Safari" in str(browser_stack) or browser_type == "safari":
            components.append(self.rendering_engines["chrome_webkit"])
            components.append("(KHTML, like Gecko)")
        components.extend(browser_stack)
        return " ".join(components)

    def generate_with_client_hints(self, **kwargs):
        ua = self.generate(**kwargs)
        return ua, self.generate_client_hints(ua)

    @staticmethod
    def parse_user_agent(user_agent: str) -> Dict[str, str]:
        """Reference :371-386."""
        out = {}
        for browser, pattern in _UA_BROWSER_PATTERNS.items():
            m = re.search(pattern, user_agent)
            if m:
                out[browser] = m.group(1)
        return out

    @classmethod
    def generate_client_hints(cls, user_agent: str) -> str:
        """Reference :388-419 — Sec-CH-UA from a UA string."""
        browsers = cls.parse_user_agent(user_agent)
        hints = []
        if "chrome" in browsers:
            hints.append(f'"Chromium";v="{browsers["chrome"]}"')
            hints.append('"Not_A Brand";v="8"')
            if "edge" in browsers:
                hints.append(f'"Microsoft Edge";v="{browsers["edge"]}"')
            else:
                hints.append(f'"Google Chrome";v="{browsers["chrome"]}"')
        elif "firefox" in browsers:
            return '""'
        elif "safari" in browsers:
            hints.append(f'"Safari";v="{browsers["safari"]}"')
            hints.append('"Not_A Brand";v="8"')
        return ", ".join(hints)


class UserAgentRotator:
    """Sticky per-session UA assignment (mirror of
    ``ProxyRotator.get_proxy_for_session`` semantics, minus TTL — a
    UA identity should outlive a crawl). Deterministic: session key ->
    UA is a pure function of (seed, first-assignment order), and
    ``assign_batch`` is the vectorized fetch-stage shape: one call per
    url batch, one sticky UA + Sec-CH-UA pair per host."""

    def __init__(self, seed: int = 0, **generate_kwargs):
        self._seed = seed
        self._generate_kwargs = generate_kwargs
        self._sessions: Dict[str, str] = {}

    def _ua_for(self, key: str) -> str:
        ua = self._sessions.get(key)
        if ua is None:
            # per-key RNG keyed by (seed, session key): assignment is
            # independent of arrival order, so distributed fetch tasks
            # agree on a host's UA without shared state
            rng = random.Random(f"{self._seed}:{key}")
            ua = UserAgentGenerator(rng=rng).generate(**self._generate_kwargs)
            self._sessions[key] = ua
        return ua

    def get_user_agent_for_session(self, session_id: str) -> str:
        return self._ua_for(session_id)

    def assign_batch(self, keys: List[str]) -> List[Dict[str, str]]:
        """One header dict per key (vectorized fetch-stage call)."""
        out = []
        for k in keys:
            ua = self._ua_for(k)
            out.append(
                {
                    "User-Agent": ua,
                    "Sec-CH-UA": UserAgentGenerator.generate_client_hints(ua),
                }
            )
        return out
