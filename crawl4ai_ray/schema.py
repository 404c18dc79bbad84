"""Fixed Arrow schemas for every logical table (SURVEY.md §1.2).

The reference is object-oriented (Pydantic ``CrawlResult`` et al.,
/root/reference/crawl4ai/models.py:129-160); our engine is columnar — one
``ray.data.Dataset`` per logical table, blocks are ``pyarrow.Table`` with
these declared schemas.  The ``docs`` shape is the authoritative
``input_hint`` from BASELINE.json.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- spans/docs
# kind ∈ {"text", "image", "video", "audio"}
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# full crawl output: docs columns + fetch metadata + lineage
CRAWL_DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("url", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("title", pa.string()),
        pa.field("description", pa.string()),
        pa.field("markdown", pa.string()),
        pa.field("status_code", pa.int16()),
        pa.field("success", pa.bool_()),
        pa.field("depth", pa.int32()),
        pa.field("parent_url", pa.string()),
        pa.field("score", pa.float32()),
        # lineage columns required by the north rule
        pa.field("frontier_epoch", pa.int32()),
        pa.field("shard_id", pa.int32()),
        pa.field("bloom_generation", pa.int32()),
    ]
)

# ---------------------------------------------------------------- frontier
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("host", pa.string()),
        pa.field("host_hash", pa.uint64()),
        pa.field("depth", pa.int32()),
        pa.field("parent_url", pa.string()),
        pa.field("score", pa.float32()),
        pa.field("epoch", pa.int32()),
        pa.field("shard_id", pa.int32()),
    ]
)

# ---------------------------------------------------------------- links
LINKS_SCHEMA = pa.schema(
    [
        pa.field("src_doc_id", pa.string()),
        pa.field("src_url", pa.string()),
        pa.field("href", pa.string()),
        pa.field("text", pa.string()),
        pa.field("title", pa.string()),
        pa.field("internal", pa.bool_()),
        pa.field("link_pos", pa.int32()),
    ]
)

# ---------------------------------------------------------------- seen set
SEEN_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("shard_id", pa.int32()),
        pa.field("epoch", pa.int32()),
    ]
)

# ---------------------------------------------------------------- metrics
METRICS_SCHEMA = pa.schema(
    [
        pa.field("epoch", pa.int32()),
        pa.field("shard_id", pa.int32()),
        pa.field("bloom_generation", pa.int32()),
        pa.field("fetched", pa.int64()),
        pa.field("skipped", pa.int64()),
        pa.field("failed", pa.int64()),
        pa.field("wall_s", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
