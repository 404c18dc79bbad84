"""Table extraction — parity with the reference's ``DefaultTableExtraction``
(/root/reference/crawl4ai/table_extraction.py:66-297): a scoring gate that
separates data tables from layout tables (thead/tbody/th structure, column
consistency, caption/summary, text density, data-* attributes, nested-table
and role=presentation penalties), then structured extraction with colspan
expansion, thead-or-first-row headers, row alignment and default headers.

lxml is absent in this container, so the walker runs on the stdlib DOM of
stages/extract.py (semantics re-implemented from the public source, not a
port; the reference file is lxml-bound).

Ray mapping: ``TableExtractStage`` — one output row per extracted table;
``rows`` ship as a JSON string column (ragged nested lists are hostile to
fixed Arrow schemas across batches).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..stages.extract import Node, parse_dom


def _descendants(node: Node, tag: str | None = None):
    for c in node.children:
        if isinstance(c, str):
            continue
        if tag is None or c.tag == tag:
            yield c
        yield from _descendants(c, tag)


def _cells(row: Node) -> list[Node]:
    return [n for n in _descendants(row) if n.tag in ("td", "th")]


def _cell_text_len(table: Node) -> int:
    return sum(
        len(cell.text_content().strip())
        for row in _descendants(table, "tr")
        for cell in _cells(row)
    )


def is_data_table(table: Node, table_score_threshold: int = 7) -> bool:
    """Reference is_data_table scoring (table_extraction.py:125-211)."""
    score = 0.0
    has_thead = any(True for _ in _descendants(table, "thead"))
    has_tbody = any(True for _ in _descendants(table, "tbody"))
    if has_thead:
        score += 2
    if has_tbody:
        score += 1

    th_count = sum(1 for _ in _descendants(table, "th"))
    rows = list(_descendants(table, "tr"))
    first_row_has_th = bool(rows) and any(c.tag == "th" for c in _cells(rows[0]))
    if th_count > 0:
        score += 2
        if has_thead or first_row_has_th:
            score += 1

    if any(True for _ in _descendants(table, "table")):
        score -= 3
    if (table.get("role") or "").lower() in {"presentation", "none"}:
        score -= 3

    if not rows:
        return False
    col_counts = [len(_cells(r)) for r in rows]
    avg_cols = sum(col_counts) / len(col_counts)
    variance = sum((c - avg_cols) ** 2 for c in col_counts) / len(col_counts)
    if variance < 1:
        score += 2

    if any(True for _ in _descendants(table, "caption")):
        score += 2
    if table.get("summary"):
        score += 1

    total_text = _cell_text_len(table)
    total_tags = sum(1 for _ in _descendants(table))
    text_ratio = total_text / (total_tags + 1e-5)
    if text_ratio > 20:
        score += 3
    elif text_ratio > 10:
        score += 2

    score += sum(1 for a in table.attrs if a.startswith("data-")) * 0.5

    if len(rows) >= 2 and avg_cols >= 2:
        score += 2
    return score >= table_score_threshold


def _in_thead(node: Node) -> bool:
    p = node.parent
    while p is not None:
        if p.tag == "thead":
            return True
        p = p.parent
    return False


def extract_table_data(table: Node) -> dict:
    """Reference extract_table_data (table_extraction.py:213-297)."""
    caption = ""
    for cap in _descendants(table, "caption"):
        direct_text = "".join(c for c in cap.children if isinstance(c, str))
        caption = direct_text.strip()
        break
    summary = (table.get("summary") or "").strip()

    def span(cell: Node) -> int:
        try:
            return int(cell.get("colspan", 1) or 1)
        except ValueError:
            return 1

    headers: list[str] = []
    thead_rows = [r for t in _descendants(table, "thead") for r in _descendants(t, "tr")]
    rows_all = list(_descendants(table, "tr"))
    if thead_rows:
        for cell in (c for c in _cells(thead_rows[0]) if c.tag == "th"):
            headers.extend([cell.text_content().strip()] * span(cell))
    elif rows_all:
        for cell in _cells(rows_all[0]):
            headers.extend([cell.text_content().strip()] * span(cell))

    rows: list[list[str]] = []
    for row in rows_all:
        if _in_thead(row):
            continue
        row_data: list[str] = []
        for cell in (c for c in _cells(row) if c.tag == "td"):
            row_data.extend([cell.text_content().strip()] * span(cell))
        if row_data:
            rows.append(row_data)

    max_columns = len(headers) if headers else (
        max((len(r) for r in rows), default=0)
    )
    aligned = [r[:max_columns] + [""] * (max_columns - len(r)) for r in rows]
    if not headers and max_columns > 0:
        headers = [f"Column {i + 1}" for i in range(max_columns)]

    first_row_has_th = bool(rows_all) and any(c.tag == "th" for c in _cells(rows_all[0]))
    metadata: dict = {
        "row_count": len(aligned),
        "column_count": max_columns,
        "has_headers": bool(thead_rows) or first_row_has_th,
        "has_caption": bool(caption),
        "has_summary": bool(summary),
    }
    if table.get("id"):
        metadata["id"] = table.get("id")
    if table.get("class"):
        metadata["class"] = table.get("class")
    return {
        "headers": headers,
        "rows": aligned,
        "caption": caption,
        "summary": summary,
        "metadata": metadata,
    }


def extract_tables(html: str, table_score_threshold: int = 7,
                   min_rows: int = 0, min_cols: int = 0) -> list[dict]:
    """All data tables of a page (reference extract_tables, :90-123)."""
    root = parse_dom(html or "")
    out = []
    for table in _descendants(root, "table"):
        if not is_data_table(table, table_score_threshold):
            continue
        data = extract_table_data(table)
        if min_rows > 0 and len(data["rows"]) < min_rows:
            continue
        if min_cols > 0:
            col_count = len(data["headers"]) or (
                max((len(r) for r in data["rows"]), default=0)
            )
            if col_count < min_cols:
                continue
        out.append(data)
    return out


class TableExtractStage:
    """map_batches stage: html column → one row per extracted data table."""

    def __init__(self, table_score_threshold: int = 7, min_rows: int = 0,
                 min_cols: int = 0, html_col: str = "html", id_col: str = "url"):
        self.threshold = table_score_threshold
        self.min_rows = min_rows
        self.min_cols = min_cols
        self.html_col = html_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        htmls = batch.column(self.html_col).to_pylist()
        out = {"id": [], "table_index": [], "caption": [], "headers": [],
               "rows_json": [], "row_count": [], "column_count": []}
        for i, h in zip(ids, htmls):
            for ti, t in enumerate(
                extract_tables(h or "", self.threshold, self.min_rows, self.min_cols)
            ):
                out["id"].append(i)
                out["table_index"].append(ti)
                out["caption"].append(t["caption"])
                out["headers"].append(t["headers"])
                out["rows_json"].append(json.dumps(t["rows"], ensure_ascii=False))
                out["row_count"].append(t["metadata"]["row_count"])
                out["column_count"].append(t["metadata"]["column_count"])
        return pa.table(
            {
                self.id_col: pa.array(out["id"]),
                "table_index": pa.array(out["table_index"], type=pa.int32()),
                "caption": pa.array(out["caption"], type=pa.string()),
                "headers": pa.array(out["headers"], type=pa.list_(pa.string())),
                "rows_json": pa.array(out["rows_json"], type=pa.string()),
                "row_count": pa.array(out["row_count"], type=pa.int64()),
                "column_count": pa.array(out["column_count"], type=pa.int64()),
            }
        )
