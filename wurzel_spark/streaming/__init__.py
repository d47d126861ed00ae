"""Structured Streaming twins of the batch event queries.

The reference has NO streaming (SURVEY §1.3) — its freshness model is cron
re-runs + versioned collections. ``Trigger.AvailableNow`` is the exact
scheduled-batch parity point; the watermarked windowed aggregation and the
stateful sessionizer are the scale-path extensions for continuous feeds.
"""
