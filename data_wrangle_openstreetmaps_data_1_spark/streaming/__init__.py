"""Structured Streaming surface (SURVEY §2.11 extension).

The reference is batch-only — its ``iterparse`` loop is streaming in the
bounded-memory sense only (reference ProjectCodeUsed/data.py:193). This
package adds the real thing: file-source ingest, watermarked windowed
aggregation, and a custom stateful operator (gap sessionization), each with
a batch twin in plans/analytics.py whose results they must match on a
finite input (tested via ``Trigger.AvailableNow``).
"""
