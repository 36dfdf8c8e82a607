"""Document-transform operators (SURVEY §2.9 T1-T6).

The reference's heavy per-document compute — DOCX→PDF
(scraper_glostrup.py:42-100), HTML clean (scraper_copenhagen.py:160-176),
document synthesis (scraper_copenhagen.py:179-246), PDF merge + cover
page (scraper_ringkoebing_skjern.py:33-67,188-243) — re-expressed as:

- pure Catalyst expressions where the transform is string-shaped
  (HTML tag strip / clean / synthesis — regexp + aggregate, codegen'd);
- Arrow-batched ``mapInPandas`` where real rendering libraries are
  required (mammoth/weasyprint/pypdf are NOT in this container — those
  steps are import-gated stubs with the Spark plumbing real and tested);
- every row wrapped in a Try-struct (ok, error) — the reference's
  per-row try/except-continue (C5, scraper.py:274-275) as data, so one
  bad document never fails the job.

Scale note: document blobs must NOT travel through shuffles at 100 TB —
transforms here are narrow (mapInPandas on the scan), and the pipeline
carries paths+metadata once blobs are landed (SURVEY §7.4).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# T2 — HTML clean / text extraction (expression-level, no UDF)

_BLOCK_TAGS = r"(?is)<(script|style|head|noscript)\b.*?</\1>"


def html_to_text(html: Column) -> Column:
    """Extract visible text from an HTML string: drop script/style blocks,
    strip tags, decode the common entities, collapse whitespace.
    Pure regexp expressions — stays in whole-stage codegen."""
    t = F.regexp_replace(html, _BLOCK_TAGS, " ")
    t = F.regexp_replace(t, r"(?i)<br\s*/?>", "\n")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in [("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"')]:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"[ \t]+", " ")
    return F.trim(t)


def html_select_div(html: Column, css_class: str) -> Column:
    """T2 — pull the first ``<div class="...{css_class}...">...</div>``
    payload (the reference's ``div.node__content`` extraction,
    scraper_copenhagen.py:160-166). Regexp-scoped; nested same-class divs
    need the UDF path."""
    pat = rf'(?is)<div[^>]*class="[^"]*{css_class}[^"]*"[^>]*>(.*?)</div>'
    return F.regexp_extract(html, pat, 1)


def strip_images(html: Column, exts: tuple[str, ...] = ("wmf", "emf")) -> Column:
    """T1 step — drop ``<img>`` tags for unrenderable formats
    (scraper_glostrup.py:74 strips WMF/EMF before PDF rendering)."""
    pat = rf"(?is)<img[^>]*src=\"[^\"]*\.({'|'.join(exts)})\"[^>]*/?>"
    return F.regexp_replace(html, pat, "")


# ---------------------------------------------------------------------------
# T3 — document synthesis (meeting header + ordered items → one HTML doc)


def synthesize_meeting_html(
    meetings: DataFrame,
    items: DataFrame,
    key: str = "meeting_key",
    title_col: str = "title",
    item_no_col: str = "item_no",
    content_col: str = "content_html",
) -> DataFrame:
    """T3 — scraper_copenhagen.py:179-246: assemble ``Punkt {n}: {title}``
    sections in item order under a meeting header, as
    sort_array(collect_list(struct)) + aggregate concatenation (one
    shuffle on the meeting key; rendering to PDF is the separate
    import-gated step)."""
    assembled = items.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col(item_no_col), F.col(title_col), F.col(content_col)))
                ),
                lambda s: F.concat(
                    F.lit("<h2>Punkt "),
                    s[item_no_col].cast("string"),
                    F.lit(": "),
                    s[title_col],
                    F.lit("</h2>\n"),
                    F.coalesce(s[content_col], F.lit("")),
                ),
            ),
            "\n",
        ).alias("body_html")
    )
    return meetings.join(assembled, key, "left").withColumn(
        "doc_html",
        F.concat(
            F.lit("<html><body><h1>"),
            F.col(key),
            F.lit("</h1>\n"),
            F.coalesce(F.col("body_html"), F.lit("")),
            F.lit("\n</body></html>"),
        ),
    )


# ---------------------------------------------------------------------------
# T1/T4/T5 — rendering transforms (import-gated; plumbing real)

TRY_SCHEMA = (
    "doc_key string, fmt string, ok boolean, content binary, error string"
)


def _try_import_renderers():
    try:
        import mammoth  # type: ignore  # noqa: F401
        import weasyprint  # type: ignore  # noqa: F401

        return True
    except ImportError:
        return False


def convert_docx_to_pdf(blobs: DataFrame) -> DataFrame:
    """T1 — DOCX→HTML→PDF (scraper_glostrup.py:42-100) as an Arrow-batched
    mapInPandas over (doc_key, fmt, content). Rows with fmt != 'docx' pass
    through untouched (the reference's content-type dispatch,
    scraper_glostrup.py:287-293). The mammoth/weasyprint render itself is
    unavailable in this container → those rows come back ok=False with a
    clear error, never an exception (C5 Try-struct)."""
    have_libs = _try_import_renderers()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            ok, err, content = [], [], []
            for fmt, blob in zip(out["fmt"], out["content"]):
                if fmt != "docx":
                    ok.append(True)
                    err.append(None)
                    content.append(blob)
                elif not have_libs:
                    ok.append(False)
                    err.append("NotImplemented: mammoth/weasyprint unavailable")
                    content.append(None)
                else:  # pragma: no cover - container has no renderers
                    try:
                        import io

                        import mammoth  # type: ignore
                        import weasyprint  # type: ignore

                        html = mammoth.convert_to_html(io.BytesIO(blob)).value
                        pdf_bytes = weasyprint.HTML(string=html).write_pdf()
                        ok.append(True)
                        err.append(None)
                        content.append(pdf_bytes)
                    except Exception as exc:
                        ok.append(False)
                        err.append(str(exc)[:500])
                        content.append(None)
            out["ok"] = ok
            out["error"] = err
            out["content"] = content
            yield out[["doc_key", "fmt", "ok", "content", "error"]]

    return blobs.select("doc_key", "fmt", "content").mapInPandas(batches, TRY_SCHEMA)


def merge_pdf_parts(parts: DataFrame, key: str = "doc_key") -> DataFrame:
    """T5 — per-meeting multi-part PDF merge + cover page
    (scraper_ringkoebing_skjern.py:33-67,188-243) as
    groupBy(key).applyInPandas. pypdf/reportlab are unavailable here →
    the merge concatenates raw part bytes with a deterministic header
    blob (plumbing + ordering semantics real and tested; swap the inner
    function for pypdf on a cluster image that has it)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("part_no")
        body = b"".join(bytes(b) for b in pdf["content"] if b is not None)
        cover = f"%COVER {pdf[key].iloc[0]} parts={len(pdf)}\n".encode()
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n_parts": [len(pdf)],
                "content": [cover + body],
            }
        )

    return parts.groupBy(key).applyInPandas(
        merge, f"{key} string, n_parts long, content binary"
    )


def with_try_struct(df: DataFrame, value_col: str, pred: Column) -> DataFrame:
    """C5 — error containment as data: rows failing `pred` get ok=False +
    error instead of failing the job; downstream filters route them to a
    dead-letter sink (S18, scraper_ishoej.py:107-110)."""
    return df.withColumn("ok", pred).withColumn(
        "error",
        F.when(pred, F.lit(None).cast("string")).otherwise(
            F.concat(F.lit("invalid "), F.lit(value_col))
        ),
    )


def dead_letter_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route ok=False rows to the quarantine side (S18 debug sink)."""
    return df.where(F.col("ok")), df.where(~F.col("ok"))
