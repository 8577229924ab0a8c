"""Streaming tier: the reference's actual domain (a Kafka Streams
operator), re-expressed on Structured Streaming.

* ``timeout_join`` — watermarked stream-stream ``leftOuter`` join: the
  watermark passing ``left.ts + window + timeout_gap`` plays the role of
  the reference's wall-clock timer (O3/O4/O5 implicit; O9/O10 come from
  checkpointing).
* ``timer_join`` — exact-timer parity variant: explicit per-key list
  state + timers reproducing the reference's mechanism and its
  cancel-all-per-key quirk behind ``strict_reference_semantics``.
  Semantics core in ``timer_core`` (pure Python); adapters on
  ``applyInPandasWithState`` (default, runs everywhere) and
  ``transformWithStateInPandas`` (PySpark 4.x native, needs protobuf).
"""
