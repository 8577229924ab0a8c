"""left_join_on_timeout_spark — a PySpark-native analytics engine with the
query semantics of the reference library ``kptfh/left-join-on-timeout``.

The reference (see ``/root/reference/README.md:5-8``) is a Kafka Streams
operator: a SQL-style left outer join between two keyed, timestamped streams
where the ``(left, null)`` row is emitted *only if* no matching right record
arrives within the join window. In Spark that semantic is native:

* **batch**   — a time-range ``leftOuter`` join (``operators.timeout_join``)
* **stream**  — a watermarked stream-stream ``leftOuter`` join
  (``streaming.timeout_join``); the watermark passing ``left.ts + window``
  plays the role of the reference's wall-clock timer
  (reference ``LeftJoinOnTimeoutBuilder.java:95-122``)
* **exact-timer parity** — ``streaming.timer_join`` re-creates the
  reference's explicit timer state store (schedule/cancel/capacity,
  incl. the strict cancel-all-per-key quirk) on stateful processors

plus the driver-mandated large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal binary columns in
``operators.multimodal``, deterministic sampling in
``operators.sampling``), the wider time-join family (nearest-match
``operators.asof_join``, keyless ``operators.range_join``), and the
source/sink surface (``sources.streams`` for keyed stream sources O1,
``sinks`` for stream sinks O8 and the ``to_json`` Kafka record layout
O13).
"""

from left_join_on_timeout_spark.builder import LeftJoinOnTimeoutBuilder
from left_join_on_timeout_spark.config import TimeoutJoinConfig
from left_join_on_timeout_spark.operators.timeout_join import (
    left_join_on_timeout,
    window_inner_join,
)
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.streaming.timeout_join import (
    left_join_on_timeout_stream,
    timeout_only_stream,
)
from left_join_on_timeout_spark.streaming.timer_join import (
    left_join_on_timeout_timers,
)

__all__ = [
    "LeftJoinOnTimeoutBuilder",
    "TimeoutJoinConfig",
    "get_spark",
    "left_join_on_timeout",
    "left_join_on_timeout_stream",
    "left_join_on_timeout_timers",
    "timeout_only_stream",
    "window_inner_join",
]

__version__ = "0.1.0"
