"""Proxy rotation — reference ``proxy_strategy.py`` re-expressed for
distributed fetch stages.

Reference semantics (crawl4ai/proxy_strategy.py):

* ``ProxyConfig`` (:12-120): server/username/password/ip record with
  ``ip`` auto-extracted from the server URL, ``from_string`` accepting
  ``ip:port:user:pass`` or ``ip:port``, ``from_env`` splitting a
  comma-separated env var, ``to_dict``/``clone``.
* ``RoundRobinProxyStrategy`` (:190-341): ``itertools.cycle`` over the
  pool; sticky sessions map session_id -> (proxy, created_at, ttl),
  expired sessions re-acquire from the cycle; ``get_session_proxy``
  peeks without creating; ``get_active_sessions`` /
  ``cleanup_expired_sessions`` filter by TTL.

Ray mapping: a proxy assignment must be *deterministic across fetch
tasks*, so the distributed path is ``assign_round_robin`` — a
vectorized batch assignment by stable arrival order (what the
reference's cycle produces for the same sequence) — while
``ProxyRotator`` keeps the reference's sticky-session object semantics
for use inside a politeness/host actor shard (one rotator per shard;
sessions are host-keyed so a host's requests reuse one egress IP, the
reference's stated deep-crawl use case). The clock is injectable so
TTL expiry is testable and virtual-time crawls stay deterministic.
"""

from __future__ import annotations

import os
from itertools import cycle
from typing import Dict, List, Optional, Tuple


class ProxyConfig:
    """Single proxy record (proxy_strategy.py:12-120)."""

    def __init__(
        self,
        server: str,
        username: Optional[str] = None,
        password: Optional[str] = None,
        ip: Optional[str] = None,
    ):
        self.server = server
        self.username = username
        self.password = password
        self.ip = ip or self._extract_ip_from_server()

    def _extract_ip_from_server(self) -> Optional[str]:
        try:
            if "://" in self.server:
                parts = self.server.split("://")[1].split(":")
                return parts[0]
            return self.server.split(":")[0]
        except Exception:
            return None

    @staticmethod
    def from_string(proxy_str: str) -> "ProxyConfig":
        parts = proxy_str.split(":")
        if len(parts) == 4:
            ip, port, username, password = parts
            return ProxyConfig(
                server=f"http://{ip}:{port}", username=username,
                password=password, ip=ip,
            )
        if len(parts) == 2:
            ip, port = parts
            return ProxyConfig(server=f"http://{ip}:{port}", ip=ip)
        raise ValueError(f"Invalid proxy string format: {proxy_str}")

    @staticmethod
    def from_dict(proxy_dict: Dict) -> "ProxyConfig":
        return ProxyConfig(
            server=proxy_dict.get("server"),
            username=proxy_dict.get("username"),
            password=proxy_dict.get("password"),
            ip=proxy_dict.get("ip"),
        )

    @staticmethod
    def from_env(env_var: str = "PROXIES") -> List["ProxyConfig"]:
        proxies: List[ProxyConfig] = []
        for proxy in os.getenv(env_var, "").split(","):
            if not proxy:
                continue
            proxies.append(ProxyConfig.from_string(proxy))
        return proxies

    def to_dict(self) -> Dict:
        return {
            "server": self.server,
            "username": self.username,
            "password": self.password,
            "ip": self.ip,
        }

    def clone(self, **kwargs) -> "ProxyConfig":
        d = self.to_dict()
        d.update(kwargs)
        return ProxyConfig.from_dict(d)


def assign_round_robin(
    keys: List[str], proxies: List[ProxyConfig], start: int = 0
) -> List[ProxyConfig]:
    """Vectorized batch equivalent of draining ``get_next_proxy`` once
    per key, in order, from cycle position ``start``.

    The distributed fetch stage calls this per batch with ``start``
    carried in actor state, so the concatenated assignment across
    batches equals one reference cycle over the whole stream.
    """
    if not proxies:
        return [None] * len(keys)
    n = len(proxies)
    return [proxies[(start + i) % n] for i in range(len(keys))]


class ProxyRotator:
    """Sticky-session round-robin (proxy_strategy.py:190-341), sync.

    ``clock`` is injectable (defaults to a monotonic virtual counter
    advanced by ``tick``) so TTL behavior is deterministic in tests and
    under the engine's virtual-time politeness scheduler.
    """

    def __init__(self, proxies: Optional[List[ProxyConfig]] = None, clock=None):
        self._proxies: List[ProxyConfig] = []
        self._proxy_cycle = None
        self._sessions: Dict[str, Tuple[ProxyConfig, float, Optional[int]]] = {}
        self._now = 0.0
        self._clock = clock
        if proxies:
            self.add_proxies(proxies)

    def _time(self) -> float:
        return self._clock() if self._clock is not None else self._now

    def tick(self, seconds: float) -> None:
        """Advance the virtual clock (no-op when a real clock is injected)."""
        self._now += seconds

    def add_proxies(self, proxies: List[ProxyConfig]) -> None:
        self._proxies.extend(proxies)
        self._proxy_cycle = cycle(self._proxies)

    def get_next_proxy(self) -> Optional[ProxyConfig]:
        if not self._proxy_cycle:
            return None
        return next(self._proxy_cycle)

    def get_proxy_for_session(
        self, session_id: str, ttl: Optional[int] = None
    ) -> Optional[ProxyConfig]:
        if session_id in self._sessions:
            proxy, created_at, session_ttl = self._sessions[session_id]
            effective_ttl = ttl if ttl is not None else session_ttl
            if effective_ttl is not None:
                if self._time() - created_at >= effective_ttl:
                    del self._sessions[session_id]
                else:
                    return proxy
            else:
                return proxy
        proxy = self.get_next_proxy()
        if proxy:
            self._sessions[session_id] = (proxy, self._time(), ttl)
        return proxy

    def release_session(self, session_id: str) -> None:
        self._sessions.pop(session_id, None)

    def get_session_proxy(self, session_id: str) -> Optional[ProxyConfig]:
        if session_id not in self._sessions:
            return None
        proxy, created_at, ttl = self._sessions[session_id]
        if ttl is not None and self._time() - created_at >= ttl:
            return None
        return proxy

    def get_active_sessions(self) -> Dict[str, ProxyConfig]:
        now = self._time()
        return {
            sid: proxy
            for sid, (proxy, created_at, ttl) in self._sessions.items()
            if ttl is None or now - created_at < ttl
        }

    def cleanup_expired_sessions(self) -> int:
        now = self._time()
        expired = [
            sid
            for sid, (_p, created_at, ttl) in self._sessions.items()
            if ttl is not None and now - created_at >= ttl
        ]
        for sid in expired:
            del self._sessions[sid]
        return len(expired)
