from left_join_on_timeout_spark.operators.timeout_join import (
    left_join_on_timeout,
    timeout_only,
    window_inner_join,
)

__all__ = ["left_join_on_timeout", "timeout_only", "window_inner_join"]
