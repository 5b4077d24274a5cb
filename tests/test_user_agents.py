"""Differential parity: state/user_agents.py vs the reference's actual
UserAgentGenerator (user_agent_generator.py:143-428), draw-for-draw —
global random is seeded and passed as our injectable rng so both sides
consume the identical entropy stream. Same pattern as the proxy suite.
"""

from __future__ import annotations

import random
import sys

import pytest

sys.path.insert(0, "tests")
from _refload import load_ref_user_agents

from crawl4ai_ray.state.user_agents import (
    UserAgentGenerator,
    UserAgentRotator,
)


@pytest.fixture(scope="module")
def ref():
    return load_ref_user_agents()


class TestGeneratorParity:
    def test_generate_fuzz(self, ref):
        theirs = ref.UserAgentGenerator()
        cases = []
        for seed in range(300):
            rng = random.Random(seed)
            device_type = rng.choice([None, "desktop", "mobile"])
            os_type = rng.choice(
                [None, "windows", "macos", "linux", "android", "ios"]
            )
            brand = rng.choice([None, "samsung", "intel", "generic", "iphone"])
            browser_type = rng.choice(
                [None, "chrome", "edge", "safari", "firefox"]
            )
            nb = rng.choice([1, 2, 3])
            cases.append((seed, device_type, os_type, brand, browser_type, nb))
        for seed, dt, ot, br, bt, nb in cases:
            random.seed(seed * 7919 + 13)
            want = theirs.generate(
                device_type=dt,
                os_type=ot,
                device_brand=br,
                browser_type=bt,
                num_browsers=nb,
            )
            random.seed(seed * 7919 + 13)
            mine = UserAgentGenerator(rng=random).generate(
                device_type=dt,
                os_type=ot,
                device_brand=br,
                browser_type=bt,
                num_browsers=nb,
            )
            assert mine == want, (seed, dt, ot, br, bt, nb)

    def test_browser_stack_parity(self, ref):
        theirs = ref.UserAgentGenerator()
        for seed in range(100):
            for nb in (1, 2, 3):
                random.seed(seed)
                want = theirs.get_browser_stack(nb)
                random.seed(seed)
                mine = UserAgentGenerator(rng=random).get_browser_stack(nb)
                assert mine == want

    def test_unsupported_stack_size(self, ref):
        with pytest.raises(ValueError):
            UserAgentGenerator().get_browser_stack(4)
        with pytest.raises(ValueError):
            ref.UserAgentGenerator().get_browser_stack(4)

    def test_client_hints_parity(self, ref):
        theirs = ref.UserAgentGenerator()
        uas = []
        for seed in range(150):
            random.seed(seed)
            uas.append(theirs.generate())
        uas += [
            "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/119.0",
            "Mozilla/5.0 (Macintosh) AppleWebKit/605.1.15 Version/16.5 Safari/605.1.15",
            "Mozilla/5.0 (Windows NT 10.0) Chrome/119.0.0.0 Edg/119.0.2151.97",
            "curl/8.0",
        ]
        for ua in uas:
            assert UserAgentGenerator.generate_client_hints(
                ua
            ) == theirs.generate_client_hints(ua), ua
            assert UserAgentGenerator.parse_user_agent(
                ua
            ) == theirs.parse_user_agent(ua), ua

    def test_catalogs_pinned_to_reference(self, ref):
        """Catalog contents equal the reference's (attribute-level)."""
        mine = UserAgentGenerator()
        theirs = ref.UserAgentGenerator()
        for attr in (
            "desktop_platforms",
            "mobile_platforms",
            "browser_combinations",
            "rendering_engines",
            "chrome_versions",
            "edge_versions",
            "safari_versions",
            "firefox_versions",
        ):
            assert getattr(mine, attr) == getattr(theirs, attr), attr


class TestRotator:
    def test_sticky_and_order_independent(self):
        r1 = UserAgentRotator(seed=42)
        r2 = UserAgentRotator(seed=42)
        hosts = [f"h{i}.example.com" for i in range(20)]
        a = [r1.get_user_agent_for_session(h) for h in hosts]
        b = [
            r2.get_user_agent_for_session(h) for h in reversed(hosts)
        ][::-1]
        assert a == b  # arrival order does not change assignment
        assert a == [r1.get_user_agent_for_session(h) for h in hosts]  # sticky
        assert len(set(a)) > 1  # actually rotates across hosts

    def test_seed_changes_assignment(self):
        hosts = [f"h{i}.example.com" for i in range(10)]
        a = UserAgentRotator(seed=1).assign_batch(hosts)
        b = UserAgentRotator(seed=2).assign_batch(hosts)
        assert a != b

    def test_assign_batch_headers(self):
        rot = UserAgentRotator(seed=7)
        out = rot.assign_batch(["a.com", "b.com", "a.com"])
        assert out[0]["User-Agent"] == out[2]["User-Agent"]
        for h in out:
            assert h["User-Agent"].startswith("Mozilla/5.0")
            assert "Sec-CH-UA" in h
            # hints must be consistent with the UA
            assert h["Sec-CH-UA"] == UserAgentGenerator.generate_client_hints(
                h["User-Agent"]
            )

    def test_constrained_generation(self):
        rot = UserAgentRotator(seed=3, device_type="mobile", os_type="ios")
        for h in rot.assign_batch(["x.com", "y.com"]):
            assert "iPhone" in h["User-Agent"] or "iPad" in h["User-Agent"]


class TestFetchSeam:
    def test_corpus_fetcher_attaches_identity(self, ray_session, tmp_path):
        import pyarrow as pa

        from crawl4ai_ray.sources import corpus as C
        from crawl4ai_ray.stages.fetch import CorpusFetcher

        cd = C.build_corpus("/root/testdata/sf0.001", variants=1)
        f = CorpusFetcher(cd, ua_seed=11)
        seeds = C.seed_urls()[:3]
        batch = pa.table(
            {
                "url": pa.array(seeds, pa.string()),
                "host": pa.array(
                    [u.split("/")[2] for u in seeds], pa.string()
                ),
            }
        )
        out = f(batch)
        assert "user_agent" in out.column_names
        assert "sec_ch_ua" in out.column_names
        # same host -> same UA across a second batch (sticky)
        out2 = f(batch)
        assert out.column("user_agent").to_pylist() == out2.column(
            "user_agent"
        ).to_pylist()
        # default stays schema-identical (no identity columns)
        f0 = CorpusFetcher(cd)
        assert "user_agent" not in f0(batch).column_names
