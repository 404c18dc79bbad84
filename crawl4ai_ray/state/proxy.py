"""Proxy rotation (reference proxy_strategy.py:1-341).

``ProxyConfig`` carries server/username/password/ip with the reference's
parsing rules (``ip:port[:username:password]`` strings, IP extraction from
the server URL, ``PROXIES`` env loading).  ``RoundRobinProxyStrategy``
mirrors the reference's rotation + sticky-session semantics (a session_id
pins one proxy until released or TTL-expired — deep crawls keep one IP per
host).  One deliberate divergence, documented: the reference guards its
session map with an ``asyncio.Lock`` inside a single event loop; our fetch
stage overlaps requests with a per-actor THREAD pool (stages/fetch.py), so
the port uses a ``threading.Lock`` — same contract, different executor.

``FailureAwareProxyStrategy`` extends rotation with quarantine: proxies
whose consecutive-failure count crosses ``max_failures`` sit out for
``cooldown`` seconds (every proxy quarantined → degrade to plain rotation
rather than stall the crawl).

Ray shape: the strategy is per-fetch-actor state (a FetchStage constructor
hook) — proxy pools are node-local resources, so no global actor is needed;
sticky sessions key on host, which is exactly the unit the frontier is
hash-partitioned by."""

from __future__ import annotations

import os
import threading
import time
from itertools import cycle


class ProxyConfig:
    """Single proxy configuration (proxy_strategy.py:12-120)."""

    def __init__(self, server: str, username: str | None = None,
                 password: str | None = None, ip: str | None = None):
        self.server = server
        self.username = username
        self.password = password
        self.ip = ip or self._extract_ip_from_server()

    def _extract_ip_from_server(self) -> str | None:
        try:
            host = self.server.split("://", 1)[1] if "://" in self.server else self.server
            return host.split(":")[0]
        except Exception:
            return None

    @staticmethod
    def from_string(proxy_str: str) -> "ProxyConfig":
        parts = proxy_str.split(":")
        if len(parts) == 4:
            ip, port, username, password = parts
            return ProxyConfig(f"http://{ip}:{port}", username, password, ip)
        if len(parts) == 2:
            ip, port = parts
            return ProxyConfig(f"http://{ip}:{port}", ip=ip)
        raise ValueError(f"Invalid proxy string format: {proxy_str}")

    @staticmethod
    def from_dict(d: dict) -> "ProxyConfig":
        return ProxyConfig(d.get("server"), d.get("username"),
                           d.get("password"), d.get("ip"))

    @staticmethod
    def from_env(env_var: str = "PROXIES") -> list["ProxyConfig"]:
        out = []
        for s in os.getenv(env_var, "").split(","):
            if s:
                out.append(ProxyConfig.from_string(s))
        return out

    def to_dict(self) -> dict:
        return {"server": self.server, "username": self.username,
                "password": self.password, "ip": self.ip}

    def clone(self, **kwargs) -> "ProxyConfig":
        d = self.to_dict()
        d.update(kwargs)
        return ProxyConfig.from_dict(d)

    def __repr__(self) -> str:
        return f"ProxyConfig({self.server!r})"


class RoundRobinProxyStrategy:
    """Round-robin rotation + sticky sessions with TTL
    (proxy_strategy.py:190-341)."""

    def __init__(self, proxies: list[ProxyConfig] | None = None, clock=time.time):
        self._proxies: list[ProxyConfig] = []
        self._cycle = None
        # session_id -> (proxy, created_at, ttl)
        self._sessions: dict[str, tuple[ProxyConfig, float, int | None]] = {}
        self._lock = threading.Lock()
        self._clock = clock
        if proxies:
            self.add_proxies(proxies)

    def add_proxies(self, proxies: list[ProxyConfig]) -> None:
        with self._lock:
            self._proxies.extend(proxies)
            self._cycle = cycle(self._proxies)

    def _next_unlocked(self) -> ProxyConfig | None:
        """Rotation step; caller must hold ``self._lock`` (subclasses
        override THIS, not get_next_proxy, so the lock discipline is
        inherited)."""
        if not self._cycle:
            return None
        return next(self._cycle)

    def get_next_proxy(self) -> ProxyConfig | None:
        # locked: callers run from FetchStage's per-actor thread pool, and
        # advancing a shared itertools.cycle is only GIL-atomic by accident
        with self._lock:
            return self._next_unlocked()

    # ----------------------------------------------------- sticky sessions
    def _expired(self, created_at: float, ttl: int | None) -> bool:
        return ttl is not None and (self._clock() - created_at) >= ttl

    def get_proxy_for_session(self, session_id: str,
                              ttl: int | None = None) -> ProxyConfig | None:
        with self._lock:
            if session_id in self._sessions:
                proxy, created_at, session_ttl = self._sessions[session_id]
                effective = ttl if ttl is not None else session_ttl
                if not self._expired(created_at, effective):
                    return proxy
                del self._sessions[session_id]
            proxy = self._next_unlocked()
            if proxy:
                self._sessions[session_id] = (proxy, self._clock(), ttl)
            return proxy

    def release_session(self, session_id: str) -> None:
        with self._lock:
            self._sessions.pop(session_id, None)

    def get_session_proxy(self, session_id: str) -> ProxyConfig | None:
        with self._lock:
            entry = self._sessions.get(session_id)
            if entry is None:
                return None
            proxy, created_at, ttl = entry
            return None if self._expired(created_at, ttl) else proxy

    def get_active_sessions(self) -> dict[str, ProxyConfig]:
        with self._lock:
            return {
                sid: proxy
                for sid, (proxy, created_at, ttl) in self._sessions.items()
                if not self._expired(created_at, ttl)
            }

    def cleanup_expired_sessions(self) -> int:
        with self._lock:
            expired = [
                sid
                for sid, (_p, created_at, ttl) in self._sessions.items()
                if self._expired(created_at, ttl)
            ]
            for sid in expired:
                del self._sessions[sid]
            return len(expired)

    # failure feedback is a no-op for plain round-robin
    def record_result(self, proxy: ProxyConfig | None, ok: bool) -> None:
        pass


class FailureAwareProxyStrategy(RoundRobinProxyStrategy):
    """Rotation with quarantine: ``max_failures`` consecutive failures put a
    proxy on a ``cooldown``-second bench; benched proxies are skipped unless
    every proxy is benched (then plain rotation resumes — a dead pool must
    not stall the crawl).  Successes reset the failure count."""

    def __init__(self, proxies=None, max_failures: int = 3,
                 cooldown: float = 60.0, clock=time.time):
        super().__init__(proxies, clock=clock)
        self.max_failures = max_failures
        self.cooldown = cooldown
        self._failures: dict[str, int] = {}
        self._benched_until: dict[str, float] = {}

    def _benched(self, proxy: ProxyConfig) -> bool:
        until = self._benched_until.get(proxy.server, 0.0)
        return self._clock() < until

    def _next_unlocked(self) -> ProxyConfig | None:
        if not self._cycle:
            return None
        for _ in range(len(self._proxies)):
            proxy = next(self._cycle)
            if not self._benched(proxy):
                return proxy
        return next(self._cycle)  # whole pool benched: degrade, don't stall

    def record_result(self, proxy: ProxyConfig | None, ok: bool) -> None:
        if proxy is None:
            return
        with self._lock:
            if ok:
                self._failures[proxy.server] = 0
                self._benched_until.pop(proxy.server, None)
                return
            n = self._failures.get(proxy.server, 0) + 1
            self._failures[proxy.server] = n
            if n >= self.max_failures:
                self._benched_until[proxy.server] = self._clock() + self.cooldown
                self._failures[proxy.server] = 0
