"""Query library over the driver's parquet tables (TESTDATA.md): one entry
per operator family from SURVEY.md §2 plus the training-data extensions
(dedup, similarity, text analysis, sessionization).  Each function takes
``sf_dir`` and returns a Dataset / pyarrow Table; the matching DuckDB oracle
SQL lives in ``ORACLE_SQL`` (names + column names must agree — the driver
hash-compares values after sorting columns by name).

Engineering rules applied throughout (the 100 TB contract):
  * reads prune columns at the source (``read_parquet(columns=[...])``);
  * per-batch work is vectorized (pyarrow.compute / numpy); Python loops
    only where a kernel doesn't exist (regex over strings);
  * aggregations pre-combine inside map_batches before the small groupby;
  * small sides of joins broadcast via ray.put, never shuffled;
  * floats that cross the DuckDB comparison are rounded identically on
    both sides.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.textstats import (
    detect_language,
    md5_fingerprint,
    quality_stats,
    rolling_fingerprint,
    simhash64,
    token_count,
)
from ..hashing import h64


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round_cols(tbl: pa.Table, cols: dict[str, int]) -> pa.Table:
    # half-away-from-zero to match DuckDB's round() (see functions/numeric.py)
    for col, nd in cols.items():
        idx = tbl.column_names.index(col)
        tbl = tbl.set_column(
            idx,
            col,
            pc.round(
                tbl.column(col).cast(pa.float64()),
                ndigits=nd,
                round_mode="half_towards_infinity",  # == away-from-zero for ±
            ),
        )
    return tbl


def _np(b: pa.Table, col: str) -> np.ndarray:
    return np.asarray(b.column(col).to_numpy(zero_copy_only=False))


# ---------------------------------------------------------------- TPC-H-ish

def q1_pricing_summary(sf_dir: str):
    """Pricing summary: filter + computed column + partial-agg groupby.

    Money/decimal values convert to exact integer cents per row BEFORE the
    distributed sum so the result is independent of summation order (see
    functions/numeric.py); per-row doubles (price×(1−disc)) are bit-identical
    across engines, so the cents conversion is too."""
    from ..functions.numeric import cents

    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"), type=pa.timestamp("us"))

    def _prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b.column("l_shipdate"), cutoff))
        price = _np(b, "l_extendedprice")
        disc = _np(b, "l_discount")
        qty = _np(b, "l_quantity")
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "qty_c": pa.array(cents(qty), type=pa.int64()),
                "base_c": pa.array(cents(price), type=pa.int64()),
                "disc_price_c": pa.array(cents(price * (1.0 - disc)), type=pa.int64()),
                "disc_e4": pa.array(cents(disc, scale=10_000), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum(on="qty_c", alias_name="qty_c"),
            Sum(on="base_c", alias_name="base_c"),
            Sum(on="disc_price_c", alias_name="disc_price_c"),
            Sum(on="disc_e4", alias_name="disc_e4"),
            Count(alias_name="count_order"),
        )
    )
    rows = agg.take_all()
    from ..functions.numeric import duck_round

    out = []
    for r in rows:
        n = r["count_order"]
        out.append(
            {
                "l_returnflag": r["l_returnflag"],
                "l_linestatus": r["l_linestatus"],
                "sum_qty": r["qty_c"] / 100.0,
                "sum_base_price": r["base_c"] / 100.0,
                "sum_disc_price": r["disc_price_c"] / 100.0,
                "avg_qty": float(duck_round(r["qty_c"] / 100.0 / n, 4)),
                "avg_disc": float(duck_round(r["disc_e4"] / 10_000.0 / n, 4)),
                "count_order": n,
            }
        )
    return pa.Table.from_pylist(out)


def revenue_by_nation(sf_dir: str):
    """Broadcast join orders→customer→nation + partial agg (SURVEY.md §2.6:
    small dimension tables ride ray.put, only the fact table streams)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nk_to_name = dict(
        zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist(),
        )
    )
    cust_to_nation = {
        ck: nk_to_name[nk]
        for ck, nk in zip(
            cust.column("c_custkey").to_pylist(), cust.column("c_nationkey").to_pylist()
        )
    }
    lookup_ref = ray.put(cust_to_nation)

    def _partial(b: pa.Table) -> pa.Table:
        from ..functions.numeric import cents

        lookup = ray.get(lookup_ref)
        keys = b.column("o_custkey").to_pylist()
        names = np.array([lookup[k] for k in keys])
        totals_c = cents(_np(b, "o_totalprice"))
        uniq = np.unique(names)
        return pa.table(
            {
                "n_name": pa.array(uniq.tolist(), type=pa.string()),
                "revenue_c": pa.array(
                    [int(totals_c[names == n].sum()) for n in uniq], type=pa.int64()
                ),
                "n_orders": pa.array(
                    [int((names == n).sum()) for n in uniq], type=pa.int64()
                ),
            }
        )

    agg = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(
            Sum(on="revenue_c", alias_name="revenue_c"),
            Sum(on="n_orders", alias_name="n_orders"),
        )
    )
    return pa.Table.from_pylist(
        [
            {
                "n_name": r["n_name"],
                "revenue": r["revenue_c"] / 100.0,
                "n_orders": r["n_orders"],
            }
            for r in agg.take_all()
        ]
    )


def top10_orders(sf_dir: str):
    """Global sort + limit (top-k)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    tbl = pa.Table.from_pylist(out.take_all())
    return _round_cols(tbl, {"o_totalprice": 2})


def part_type_stats(sf_dir: str):
    from ..functions.numeric import cents, duck_round

    ds = _read(sf_dir, "part", columns=["p_type", "p_retailprice", "p_size"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_type": b.column("p_type"),
                "price_c": pa.array(cents(_np(b, "p_retailprice")), type=pa.int64()),
                "p_size": b.column("p_size"),
            }
        )

    agg = (
        ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p_type")
        .aggregate(
            Count(alias_name="n_parts"),
            Sum(on="price_c", alias_name="price_c"),
            Min(on="p_size", alias_name="min_size"),
            Max(on="p_size", alias_name="max_size"),
        )
    )
    return pa.Table.from_pylist(
        [
            {
                "p_type": r["p_type"],
                "n_parts": r["n_parts"],
                "avg_price": float(duck_round(r["price_c"] / 100.0 / r["n_parts"], 2)),
                "min_size": r["min_size"],
                "max_size": r["max_size"],
            }
            for r in agg.take_all()
        ]
    )


def revenue_by_returnflag(sf_dir: str):
    """Filter + computed revenue + tiny groupby."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )
    lo = pa.scalar(np.datetime64("1995-01-01", "us"), type=pa.timestamp("us"))

    def _prep(b: pa.Table) -> pa.Table:
        from ..functions.numeric import cents

        b = b.filter(pc.greater_equal(b.column("l_shipdate"), lo))
        rev = (
            _np(b, "l_extendedprice")
            * (1.0 - _np(b, "l_discount"))
            * (1.0 + _np(b, "l_tax"))
        )
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "rev_c": pa.array(cents(rev), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(Sum(on="rev_c", alias_name="rev_c"), Count(alias_name="n_items"))
    )
    return pa.Table.from_pylist(
        [
            {
                "l_returnflag": r["l_returnflag"],
                "revenue": r["rev_c"] / 100.0,
                "n_items": r["n_items"],
            }
            for r in agg.take_all()
        ]
    )


# ------------------------------------------------------------------ events

def events_by_type_day(sf_dir: str):
    """Temporal truncation + groupby (windowed-by-day aggregate)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def _prep(b: pa.Table) -> pa.Table:
        from ..functions.numeric import cents

        return pa.table(
            {
                "event_type": b.column("event_type"),
                "day": pc.floor_temporal(b.column("ts"), unit="day"),
                "value_c": pa.array(cents(_np(b, "value")), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n_events"), Sum(on="value_c", alias_name="value_c"))
    )
    rows = [
        {
            "event_type": r["event_type"],
            "day": r["day"],
            "n_events": r["n_events"],
            "total_value": r["value_c"] / 100.0,
        }
        for r in agg.take_all()
    ]
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows], type=pa.string()),
            "day": pa.array([r["day"] for r in rows], type=pa.timestamp("us")),
            "n_events": pa.array([r["n_events"] for r in rows], type=pa.int64()),
            "total_value": pa.array([r["total_value"] for r in rows], type=pa.float64()),
        }
    )


def user_session_stats(sf_dir: str, gap_s: int = 1800):
    """Sessionization: 30-min-gap windows per user via groupby().map_groups
    (the stateful-window operator the Dataset API lacks natively)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def _sessionize(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        ts = group.column("ts").take(order).cast(pa.int64()).to_numpy()  # µs
        gaps = np.diff(ts) > gap_s * 1_000_000
        n_sessions = 1 + int(gaps.sum()) if len(ts) else 0
        return pa.table(
            {
                "user_id": [group.column("user_id")[0].as_py()],
                "n_sessions": pa.array([n_sessions], type=pa.int64()),
                "n_events": pa.array([len(ts)], type=pa.int64()),
            }
        )

    return pa.Table.from_pylist(
        ds.groupby("user_id").map_groups(_sessionize, batch_format="pyarrow").take_all()
    )


# --------------------------------------------------------------- documents

def dedup_exact(sf_dir: str):
    """Exact dedup: min doc_id per identical text (hash-combined shuffle)."""
    from ..stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pa.Table.from_pylist(exact_dedup(ds, "text", "doc_id").take_all())


def token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _count(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(
                    [token_count(t or "") for t in b.column("text").to_pylist()],
                    type=pa.int64(),
                ),
            }
        )

    return ds.map_batches(_count, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _q(b: pa.Table) -> pa.Table:
        stats = [quality_stats(t or "") for t in b.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": pa.array([s["n_chars"] for s in stats], type=pa.int64()),
                "n_tokens": pa.array([s["n_tokens"] for s in stats], type=pa.int64()),
                "avg_token_len": pa.array(
                    [s["avg_token_len"] for s in stats], type=pa.float64()
                ),
                "alpha_ratio": pa.array(
                    [s["alpha_ratio"] for s in stats], type=pa.float64()
                ),
            }
        )

    return ds.map_batches(_q, batch_format="pyarrow", zero_copy_batch=True)


def lang_distribution(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang"])
    return pa.Table.from_pylist(
        ds.groupby("lang").aggregate(Count(alias_name="n_docs")).take_all()
    )


def fingerprint_md5(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "fingerprint": pa.array(
                    [md5_fingerprint(t or "") for t in b.column("text").to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    return ds.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)


def langid_predict(sf_dir: str):
    """Heuristic language-ID (no SQL oracle — model-style scorer)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def _lid(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "predicted": pa.array(
                    [detect_language(t or "") for t in b.column("text").to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    return ds.map_batches(_lid, batch_format="pyarrow", zero_copy_batch=True)


def doc_fingerprint_rolling(sf_dir: str):
    """Rolling-hash document fingerprint (no SQL equivalent)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "fingerprint": pa.array(
                    [rolling_fingerprint(t or "") for t in b.column("text").to_pylist()],
                    type=pa.int64(),  # < 2^61 by construction — int64-safe
                ),
            }
        )

    return ds.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)


def simhash_docs(sf_dir: str):
    from ..stages.dedup import simhash_signatures

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_signatures(ds)


def minhash_neardup_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs verified by n-gram jaccard (rows-only)."""
    import pyarrow.parquet as pq

    from ..stages.dedup import minhash_dedup_pairs

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    lookup = dict(
        zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    )
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pa.Table.from_pylist(
        minhash_dedup_pairs(ds, threshold=0.5, texts_lookup=lookup).take_all()
    )


# -------------------------------------------------------------- embeddings

def _query_vec(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist())
    vecs = t.column("embedding").to_pylist()
    return np.asarray(vecs[int(np.nonzero(ids == 0)[0][0])], dtype=np.float64)


def knn_cosine_top10(sf_dir: str):
    """Brute-force cosine top-k vs the vec_id=0 query (broadcast + local
    top-k merge)."""
    from ..stages.similarity import knn_cosine

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_cosine(ds, _query_vec(sf_dir), k=10)


def knn_cosine_lsh(sf_dir: str):
    """LSH-bucketed ANN variant (scale path; rows-only check — candidates
    within the query's hyperplane bucket neighborhood, re-ranked exactly)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import HyperplaneLSHStage, knn_cosine

    q = _query_vec(sf_dir)
    dim = len(q)
    stage = HyperplaneLSHStage(dim=dim, n_planes=8, seed=7)
    qbits = (q[None, :] @ stage.planes.T) > 0
    qkey = 0
    for i in range(stage.planes.shape[0]):
        if qbits[0, i]:
            qkey |= 1 << i
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sigs = ds.map_batches(
        HyperplaneLSHStage,
        fn_constructor_kwargs=dict(dim=dim, n_planes=8, seed=7),
        batch_format="pyarrow",
        concurrency=(1, 2),
        zero_copy_batch=True,
    )
    # candidates: same bucket or hamming-1 neighbor buckets
    near = {qkey} | {qkey ^ (1 << i) for i in range(8)}
    cand_ids = set()
    for row in sigs.take_all():
        if row["bucket"] in near:
            cand_ids.add(row["vec_id"])
    cand_set = frozenset(cand_ids)

    def _in_bucket(b: pa.Table) -> pa.Table:
        mask = [v in cand_set for v in b.column("vec_id").to_pylist()]
        return b.filter(pa.array(mask))

    cand = ds.map_batches(_in_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return knn_cosine(cand, q, k=min(10, len(cand_ids)))


def embedding_neardup(sf_dir: str, threshold: float = 0.3):
    """All-pairs cosine ≥ threshold (brute-force blocked matmul against a
    broadcast normalized matrix)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import cosine_neardup_pairs, _normalize

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = _normalize(np.asarray(t.column("embedding").to_pylist(), dtype=np.float64))
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = cosine_neardup_pairs(ds, threshold=threshold, full_matrix=(ids, m))
    return pa.Table.from_pylist(pairs.take_all())


def embedding_neardup_lsh(sf_dir: str, threshold: float = 0.3):
    """Scale-path near-dup: hyperplane-LSH candidates → exact cosine verify
    (rows-only; recall-vs-brute-force characterized in tests)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import _normalize, lsh_neardup_pairs

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = _normalize(np.asarray(t.column("embedding").to_pylist(), dtype=np.float64))
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return pa.Table.from_pylist(
        lsh_neardup_pairs(ds, ids, m, threshold=threshold, n_planes=6).take_all()
    )


def docs_interleaved(sf_dir: str):
    """The canonical output contract (BASELINE.json input_hint): crawl the
    synthetic site and return exactly (doc_id:string,
    spans:list<struct<kind,text,media_ref,offset>>)."""
    import tempfile

    from .crawl import CrawlConfig, CrawlEngine
    from ..sources.corpus import CorpusParams, SyntheticTransport, robots_map

    params = CorpusParams(n_hosts=2, pages_per_host=30, seed=42)
    cfg = CrawlConfig(max_depth=5, num_seen_shards=2, num_politeness_shards=1,
                      deterministic=True)
    engine = CrawlEngine(
        SyntheticTransport(params), cfg, tempfile.mkdtemp(prefix="docs_ilv_"),
        robots_bodies=robots_map(params),
    )
    engine.run(params.seeds())
    docs = engine.docs_dataset()

    from ..schema import DOCS_SCHEMA, SPAN_STRUCT

    rows = docs.select_columns(["doc_id", "spans"]).take_all()
    # rebuild with the declared schema (dict round-trips reorder struct
    # fields alphabetically and widen offset to int64)
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
            "spans": pa.array(
                [r["spans"] for r in rows], type=pa.list_(SPAN_STRUCT)
            ),
        },
        schema=DOCS_SCHEMA,
    )


# --------------------------------------------------------------- interleaved

def spans_flat(sf_dir: str):
    """Build the interleaved docs table (input_hint shape) from documents:
    text split into 12-token text spans, a synthetic image span after every
    3rd chunk; returned flattened (doc_id, offset, kind, text, media_ref)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _spans(b: pa.Table) -> pa.Table:
        out = {"doc_id": [], "offset": [], "kind": [], "text": [], "media_ref": []}
        for doc_id, text in zip(
            b.column("doc_id").to_pylist(), b.column("text").to_pylist()
        ):
            toks = (text or "").split()
            chunks = [" ".join(toks[i : i + 12]) for i in range(0, len(toks), 12)]
            off = 0
            for ci, chunk in enumerate(chunks):
                out["doc_id"].append(doc_id)
                out["offset"].append(off)
                out["kind"].append("text")
                out["text"].append(chunk)
                out["media_ref"].append("")
                off += 1
                if ci % 3 == 2:
                    out["doc_id"].append(doc_id)
                    out["offset"].append(off)
                    out["kind"].append("image")
                    out["text"].append("")
                    out["media_ref"].append(f"media://doc{doc_id}/img{ci // 3}")
                    off += 1
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "offset": pa.array(out["offset"], type=pa.int32()),
                "kind": pa.array(out["kind"], type=pa.string()),
                "text": pa.array(out["text"], type=pa.string()),
                "media_ref": pa.array(out["media_ref"], type=pa.string()),
            }
        )

    return ds.map_batches(_spans, batch_format="pyarrow", zero_copy_batch=True)


def media_catalog(sf_dir: str):
    """Multimodal plumbing demo: spans → media rows → actor-pool decode
    stage (deterministic fake decoder; real decoder is a stub — libs absent)."""
    from ..stages.multimodal import MediaDecodeStage, spans_to_media_rows

    spans = spans_flat(sf_dir)

    def _to_docs(b: pa.Table) -> pa.Table:
        media_mask = pc.not_equal(b.column("kind"), pa.scalar("text"))
        b = b.filter(media_mask)
        n = b.num_rows
        return pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.string()),
                "media_ref": b.column("media_ref"),
                "kind": b.column("kind"),
                "payload": pa.array([b""] * n, type=pa.binary()),
                "meta": pa.array(
                    [{"width": 0, "height": 0, "format": "", "n_frames": 0}] * n,
                    type=pa.struct(
                        [
                            pa.field("width", pa.int32()),
                            pa.field("height", pa.int32()),
                            pa.field("format", pa.string()),
                            pa.field("n_frames", pa.int32()),
                        ]
                    ),
                ),
            }
        )

    media = spans.map_batches(_to_docs, batch_format="pyarrow", zero_copy_batch=True)
    decoded = media.map_batches(
        MediaDecodeStage,
        batch_size=64,
        batch_format="pyarrow",
        concurrency=(1, 2),
        zero_copy_batch=True,
    )

    def _flatten_meta(b: pa.Table) -> pa.Table:
        meta = b.column("meta").to_pylist()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "media_ref": b.column("media_ref"),
                "kind": b.column("kind"),
                "width": pa.array([m["width"] for m in meta], type=pa.int32()),
                "height": pa.array([m["height"] for m in meta], type=pa.int32()),
                "format": pa.array([m["format"] for m in meta], type=pa.string()),
            }
        )

    return decoded.map_batches(_flatten_meta, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------- chunk/extract

def chunks_fixed(sf_dir: str, chunk_size: int = 50):
    """FixedLengthWordChunking over documents → (doc_id, chunk_idx, chunk)
    (reference chunking_strategy.py:148-170; flat_map shape)."""
    from ..functions.chunking import ChunkStage, FixedLengthWordChunking

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        ChunkStage,
        fn_constructor_kwargs=dict(
            chunker_factory=lambda: FixedLengthWordChunking(chunk_size)
        ),
        batch_format="pyarrow",
        concurrency=(1, 2),
        zero_copy_batch=True,
    )


def regex_numbers_events(sf_dir: str):
    """RegexExtractionStrategy 'number' catalog over events.props
    (extraction_strategy.py:1945-2114)."""
    from ..functions.regex_extract import RegexExtractStage

    ds = _read(sf_dir, "events", columns=["event_id", "props"])
    out = ds.map_batches(
        RegexExtractStage,
        fn_constructor_kwargs=dict(
            labels=["number"], id_col="event_id", text_col="props"
        ),
        batch_format="pyarrow",
        concurrency=(1, 2),
        zero_copy_batch=True,
    )

    def _project(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": b.column("doc_id"), "value": b.column("value")}
        )

    return out.map_batches(_project, batch_format="pyarrow", zero_copy_batch=True)


def structured_roundtrip(sf_dir: str):
    """Schema-driven JsonCss extraction round-trip: render part rows to HTML,
    extract them back with a CSS schema — value-exact vs the source table."""
    import json

    from ..functions.structured_extract import JsonCssExtractor

    schema = {
        "baseSelector": "div.part",
        "fields": [
            {"name": "name", "selector": "h2.name", "type": "text"},
            {"name": "brand", "selector": "span.brand", "type": "text"},
            {"name": "p_size", "selector": "span.size", "type": "regex", "pattern": r"size:(\d+)"},
        ],
    }
    ds = _read(sf_dir, "part", columns=["p_name", "p_brand", "p_size"])

    def _render_and_extract(b: pa.Table) -> pa.Table:
        extractor = JsonCssExtractor(schema)
        html = "".join(
            f'<div class="part"><h2 class="name">{n}</h2>'
            f'<span class="brand">{br}</span><span class="size">size:{s}</span></div>'
            for n, br, s in zip(
                b.column("p_name").to_pylist(),
                b.column("p_brand").to_pylist(),
                b.column("p_size").to_pylist(),
            )
        )
        items = extractor.extract(html)
        return pa.table(
            {
                "name": pa.array([i["name"] for i in items], type=pa.string()),
                "brand": pa.array([i["brand"] for i in items], type=pa.string()),
                "p_size": pa.array([int(i["p_size"]) for i in items], type=pa.int32()),
            }
        )

    return ds.map_batches(_render_and_extract, batch_format="pyarrow", zero_copy_batch=True)


def bm25_rank_docs(sf_dir: str, query: str = "stream batch merge sort"):
    """Corpus-level BM25 (barrier aggregation: DF stats combined then
    broadcast — SURVEY.md §2.7) over documents (rows-only: Okapi floor
    semantics aren't SQL-expressible)."""
    from ..functions.bm25 import bm25_rank_dataset

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_rank_dataset(ds, query)


def fit_markdown_demo(sf_dir: str):
    """Pruning + BM25 content filters over synthetic pages → fit_markdown
    lengths (rows-only; reference content_filter_strategy.py semantics)."""
    from ..functions.content_filter import BM25ContentFilter, PruningContentFilter
    from ..sources.corpus import CorpusParams, page_url, synthesize_html

    params = CorpusParams(n_hosts=2, pages_per_host=60, seed=42)
    items = [
        {"url": page_url(params, h, p), "html": synthesize_html(params, h, p)}
        for h in range(2)
        for p in range(1, 60)
    ]
    ds = ray.data.from_items(items)

    def _filter(b: pa.Table) -> pa.Table:
        prune = PruningContentFilter(threshold=0.3)
        bm25 = BM25ContentFilter()
        htmls = b.column("html").to_pylist()
        pruned = ["\n\n".join(prune.filter_content(h)) for h in htmls]
        relevant = ["\n\n".join(bm25.filter_content(h)) for h in htmls]
        return pa.table(
            {
                "url": b.column("url"),
                "pruned_len": pa.array([len(p) for p in pruned], type=pa.int64()),
                "bm25_len": pa.array([len(r) for r in relevant], type=pa.int64()),
            }
        )

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def seeder_sitemap_demo(sf_dir: str):
    """AsyncUrlSeeder-equivalent pipeline over synthetic sitemaps: discovery
    + nonsense/pattern gate + BM25 relevance ranking (rows-only)."""
    from ..sources.corpus import CorpusParams
    from ..sources.seeder import SyntheticSitemapTransport, seed_urls

    params = CorpusParams(n_hosts=4, pages_per_host=300, seed=42)
    t = SyntheticSitemapTransport(params, chunk=120)
    return seed_urls(
        [params.host(i) for i in range(params.n_hosts)],
        t,
        pattern="*/p/*",
        query="synthetic crawl page",
        max_urls=100,
    )


def adaptive_digest_demo(sf_dir: str):
    """Adaptive crawl digest (statistical strategy port) on the synthetic
    corpus → per-round metrics table (rows-only)."""
    from ..sources.corpus import CorpusParams, SyntheticTransport
    from .adaptive import AdaptiveCrawler, AdaptiveConfig

    params = CorpusParams(n_hosts=2, pages_per_host=50, seed=42)
    crawler = AdaptiveCrawler(
        SyntheticTransport(params),
        query="crawl frontier data stream",
        config=AdaptiveConfig(max_pages=12, top_k_links=3, confidence_threshold=0.9),
    )
    out = crawler.digest("http://site0.test/")
    return pa.table(
        {
            "rank": pa.array(range(len(out["crawl_order"])), type=pa.int32()),
            "url": pa.array(out["crawl_order"], type=pa.string()),
            "confidence": pa.array(
                [round(out["confidence"], 4)] * len(out["crawl_order"]), type=pa.float64()
            ),
        }
    )


# -------------------------------------------------------------------- crawl

def crawl_bfs_demo(sf_dir: str):
    """The flagship: full BFS crawl of a synthetic site (parity mode),
    returning one row per crawled page (rows-only check — the real
    correctness gate is the oracle-parity pytest suite)."""
    import tempfile

    from .crawl import CrawlConfig, CrawlEngine
    from ..sources.corpus import CorpusParams, SyntheticTransport, robots_map

    params = CorpusParams(n_hosts=3, pages_per_host=40, seed=42, private_every=9)
    cfg = CrawlConfig(
        max_depth=5,
        num_seen_shards=2,
        num_politeness_shards=1,
        fetch_batch_size=32,
        deterministic=True,
    )
    engine = CrawlEngine(
        SyntheticTransport(params), cfg, tempfile.mkdtemp(prefix="crawl_demo_"),
        robots_bodies=robots_map(params),
    )
    engine.run(params.seeds())
    docs = engine.docs_dataset()

    def _summary(b: pa.Table) -> pa.Table:
        spans = b.column("spans").to_pylist()
        return pa.table(
            {
                "url": b.column("url"),
                "depth": b.column("depth"),
                "status_code": b.column("status_code"),
                "frontier_epoch": b.column("frontier_epoch"),
                "n_spans": pa.array([len(s or []) for s in spans], type=pa.int64()),
            }
        )

    return pa.Table.from_pylist(
        docs.map_batches(_summary, batch_format="pyarrow", zero_copy_batch=True).take_all()
    )


# ================================================================== registry

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "revenue_by_nation": revenue_by_nation,
    "top10_orders": top10_orders,
    "part_type_stats": part_type_stats,
    "revenue_by_returnflag": revenue_by_returnflag,
    "events_by_type_day": events_by_type_day,
    "user_session_stats": user_session_stats,
    "dedup_exact": dedup_exact,
    "token_counts": token_counts,
    "quality_scores": quality_scores,
    "lang_distribution": lang_distribution,
    "fingerprint_md5": fingerprint_md5,
    "langid_predict": langid_predict,
    "doc_fingerprint_rolling": doc_fingerprint_rolling,
    "simhash_docs": simhash_docs,
    "minhash_neardup_pairs": minhash_neardup_pairs,
    "knn_cosine_top10": knn_cosine_top10,
    "knn_cosine_lsh": knn_cosine_lsh,
    "embedding_neardup": embedding_neardup,
    "embedding_neardup_lsh": embedding_neardup_lsh,
    "docs_interleaved": docs_interleaved,
    "spans_flat": spans_flat,
    "media_catalog": media_catalog,
    "chunks_fixed": chunks_fixed,
    "regex_numbers_events": regex_numbers_events,
    "structured_roundtrip": structured_roundtrip,
    "bm25_rank_docs": bm25_rank_docs,
    "fit_markdown_demo": fit_markdown_demo,
    "seeder_sitemap_demo": seeder_sitemap_demo,
    "adaptive_digest_demo": adaptive_digest_demo,
    "crawl_bfs_demo": crawl_bfs_demo,
}

ORACLE_SQL = {
    # money sums go through exact integer cents on BOTH sides so the result
    # doesn't depend on float summation order (functions/numeric.py)
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty,
               sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0 AS sum_disc_price,
               round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 / count(*), 4) AS avg_qty,
               round(sum(CAST(round(l_discount * 10000, 0) AS BIGINT)) / 10000.0 / count(*), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "revenue_by_nation": """
        SELECT n_name,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "top10_orders": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "part_type_stats": """
        SELECT p_type,
               count(*) AS n_parts,
               round(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT)) / 100.0 / count(*), 2) AS avg_price,
               min(p_size) AS min_size,
               max(p_size) AS max_size
        FROM part
        GROUP BY p_type
    """,
    "revenue_by_returnflag": """
        SELECT l_returnflag,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) AS BIGINT)) / 100.0 AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        GROUP BY l_returnflag
    """,
    "events_by_type_day": """
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               count(*) AS n_events,
               sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
        FROM events
        GROUP BY event_type, date_trunc('day', ts)
    """,
    "user_session_stats": """
        WITH ordered AS (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ),
        marked AS (
            SELECT user_id,
                   CASE WHEN prev_ts IS NULL
                             OR epoch(ts) - epoch(prev_ts) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM ordered
        )
        SELECT user_id,
               CAST(sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM marked
        GROUP BY user_id
    """,
    "dedup_exact": """
        SELECT min(doc_id) AS doc_id
        FROM documents
        GROUP BY text
    """,
    "token_counts": r"""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens
        FROM documents
    """,
    "quality_scores": r"""
        SELECT doc_id,
               length(text) AS n_chars,
               len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens,
               round(length(regexp_replace(text, '\s', '', 'g'))
                     / greatest(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')), 1.0),
                     3) AS avg_token_len,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                     / greatest(length(text), 1.0), 3) AS alpha_ratio
        FROM documents
    """,
    "lang_distribution": """
        SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    """,
    "fingerprint_md5": """
        SELECT doc_id, md5(text) AS fingerprint FROM documents
    """,
    "knn_cosine_top10": """
        SELECT vec_id,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                     (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS cos
        FROM embeddings
        ORDER BY cos DESC, vec_id
        LIMIT 10
    """,
    "embedding_neardup": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
    "chunks_fixed": r"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS words
            FROM documents
        )
        SELECT doc_id,
               CAST(u.gs AS INTEGER) AS chunk_idx,
               array_to_string(words[u.gs * 50 + 1 : u.gs * 50 + 50], ' ') AS chunk
        FROM w, UNNEST(range(CAST(ceil(len(words) / 50.0) AS BIGINT))) AS u(gs)
    """,
    "regex_numbers_events": r"""
        SELECT event_id,
               unnest(regexp_extract_all(props, '\b\d{1,3}(?:[,.\s]\d{3})*(?:\.\d+)?\b')) AS value
        FROM events
    """,
    "structured_roundtrip": """
        SELECT p_name AS name, p_brand AS brand, p_size FROM part
    """,
    # bm25_rank_docs / langid_predict / doc_fingerprint_rolling / simhash_docs /
    # minhash_neardup_pairs / knn_cosine_lsh / spans_flat / media_catalog /
    # crawl_bfs_demo: no SQL equivalent (model scorers, custom hashes, LSH,
    # stateful crawl) — rows-only check by design.
}
