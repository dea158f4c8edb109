from .engagement import engagement_seconds, engagement_pct, props_get  # noqa: F401
