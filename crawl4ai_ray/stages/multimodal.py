"""Multimodal plumbing: media columns as opaque binary + typed metadata.

Image/audio decode libraries are not in this container, so the *decode
kernels* are stubbed (NotImplementedError behind ``RealDecoder``, plus a
deterministic fake used by tests/bench), but everything Ray-side is real and
tested: schema (binary payload column + struct metadata), actor-pool stage
signature (decoder built once per actor), small-batch sizing for wide binary
rows, and the output layout.

Mirrors the reference's media model (MediaItem {src, data, alt, desc, score,
type, format, width}, /root/reference/crawl4ai/models.py:343-352) with the
payload lifted into a first-class binary column.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("kind", pa.string()),  # image | video | audio
        pa.field("payload", pa.binary()),
        pa.field("meta", pa.struct([
            pa.field("width", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("format", pa.string()),
            pa.field("n_frames", pa.int32()),
        ])),
    ]
)


def spans_to_media_rows(batch: pa.Table) -> pa.Table:
    """docs(spans) → media table rows (one per media span); payload left
    empty (filled by a fetch/decode stage downstream)."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    out = {"doc_id": [], "media_ref": [], "kind": []}
    for doc_id, spans in zip(doc_ids, spans_col):
        for s in spans or []:
            if s["kind"] != "text":
                out["doc_id"].append(doc_id)
                out["media_ref"].append(s["media_ref"])
                out["kind"].append(s["kind"])
    n = len(out["doc_id"])
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], type=pa.string()),
            "media_ref": pa.array(out["media_ref"], type=pa.string()),
            "kind": pa.array(out["kind"], type=pa.string()),
            "payload": pa.array([b""] * n, type=pa.binary()),
            "meta": pa.array(
                [{"width": 0, "height": 0, "format": "", "n_frames": 0}] * n,
                type=MEDIA_SCHEMA.field("meta").type,
            ),
        }
    )


class RealDecoder:
    """Placeholder for a PIL/ffmpeg-backed decoder — NOT available in this
    container.  A real deployment implements decode() with the actual lib."""

    def decode(self, payload: bytes, kind: str) -> dict:
        raise NotImplementedError(
            "image/audio decode libs are not installed in this sandbox; "
            "use DeterministicFakeDecoder for tests"
        )


class DeterministicFakeDecoder:
    """Deterministic stand-in: metadata derived from md5(payload) so tests
    AND the DuckDB oracle can recompute exact outputs (md5 is the hash both
    sides share; see ORACLE_SQL['media_catalog'])."""

    def decode(self, payload: bytes, kind: str) -> dict:
        h = hashlib.md5(payload).hexdigest()
        return {
            "width": 64 + int(h[0:2], 16),
            "height": 64 + int(h[2:4], 16),
            "format": {"image": "jpg", "video": "mp4", "audio": "mp3"}.get(kind, ""),
            "n_frames": 1 + int(h[4:6], 16) if kind == "video" else 1,
        }


class MediaDecodeStage:
    """Actor-pool map_batches stage: decoder constructed ONCE per actor
    (model-load pattern); per batch fills the meta struct from payloads.

    Use small batch_size (wide binary rows): e.g.
    ``ds.map_batches(MediaDecodeStage, fn_constructor_kwargs={...},
    concurrency=N, batch_size=16, num_cpus=1)``.
    """

    def __init__(self, decoder_factory=DeterministicFakeDecoder, synth_payload: bool = True):
        self.decoder = decoder_factory()
        self.synth_payload = synth_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        metas = []
        out_payloads = []
        for ref, kind, payload in zip(refs, kinds, payloads):
            if not payload and self.synth_payload:
                # synthetic payload derived from the ref (sandbox: no network);
                # ascii hex so the SQL oracle can rebuild it as md5(ref)
                payload = hashlib.md5(ref.encode()).hexdigest().encode()
            out_payloads.append(payload)
            metas.append(self.decoder.decode(payload, kind))
        out = batch.drop_columns(["payload", "meta"])
        out = out.append_column("payload", pa.array(out_payloads, type=pa.binary()))
        out = out.append_column(
            "meta", pa.array(metas, type=MEDIA_SCHEMA.field("meta").type)
        )
        return out
