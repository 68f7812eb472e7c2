from tpu_vector_db.api.middleware.rate_limiting import (  # noqa: F401
    OperationType,
    ProductionRateLimiter,
    RateLimitConfig,
    UserTier,
)
