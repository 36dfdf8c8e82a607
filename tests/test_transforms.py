"""Tests for document transforms (T1-T5 plumbing) and multimodal binary
ops — rows-only / golden-fixture strategy (SURVEY §5 item 3)."""

from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.fixtures import agenda_items_fixture
from kommunedata_data_pipeline_spark.transforms.documents import (
    convert_docx_to_pdf,
    dead_letter_split,
    html_select_div,
    html_to_text,
    merge_pdf_parts,
    strip_images,
    synthesize_meeting_html,
)
from kommunedata_data_pipeline_spark.transforms.multimodal import (
    extract_features,
    extract_media_meta,
    make_png,
    make_wav,
    sniff_format,
)


def test_html_to_text(spark):
    html = "<html><head><title>x</title></head><body><p>Hello&nbsp;<b>World</b></p><script>evil()</script></body></html>"
    got = spark.createDataFrame([(html,)], "h string").select(
        html_to_text(F.col("h")).alias("t")
    ).collect()[0].t
    assert got == "Hello World"


def test_html_select_div_and_strip_images(spark):
    html = '<div class="junk">no</div><div class="node__content">payload <img src="a.wmf"/> here</div>'
    df = spark.createDataFrame([(html,)], "h string")
    sel = df.select(html_select_div(F.col("h"), "node__content").alias("v")).collect()[0].v
    assert "payload" in sel and "junk" not in sel
    stripped = df.select(strip_images(F.col("h")).alias("v")).collect()[0].v
    assert ".wmf" not in stripped


def test_synthesize_meeting_html_orders_items(spark):
    items = agenda_items_fixture(spark)
    meetings = items.select("meeting_key").distinct()
    out = synthesize_meeting_html(meetings, items).orderBy("meeting_key").collect()
    m1 = next(r for r in out if r.meeting_key == "m1")
    # items must appear in item_no order despite shuffled input
    i1 = m1.doc_html.index("Punkt 1")
    i2 = m1.doc_html.index("Punkt 2")
    i3 = m1.doc_html.index("Punkt 3")
    assert i1 < i2 < i3


def _docx_fixture(paragraphs):
    """Minimal but structurally real .docx: a zip with word/document.xml."""
    import io
    import zipfile

    body = "".join(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs)
    xml = (
        '<?xml version="1.0"?><w:document '
        'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", xml)
    return buf.getvalue()


def test_convert_docx_renders_real_pdf(spark):
    from kommunedata_data_pipeline_spark.transforms import pdfmini

    docx = _docx_fixture(["Dagsorden", "Punkt 1: budget"])
    blobs = spark.createDataFrame(
        [
            ("a.pdf", "pdf", b"%PDF-1.4 x"),
            ("b.docx", "docx", docx),
            ("c.docx", "docx", b"PK\x03\x04corrupt"),
        ],
        "doc_key string, fmt string, content binary",
    )
    out = convert_docx_to_pdf(blobs)
    by_key = {r.doc_key: r for r in out.collect()}
    # non-docx passes through untouched
    assert by_key["a.pdf"].ok and bytes(by_key["a.pdf"].content) == b"%PDF-1.4 x"
    # real DOCX → real 1-page PDF whose text round-trips
    blob = bytes(by_key["b.docx"].content)
    assert by_key["b.docx"].ok and pdfmini.is_pdf(blob)
    assert pdfmini.page_count(blob) == 1
    assert "Punkt 1: budget" in pdfmini.extract_text(blob)
    # corrupt DOCX → contained failure (C5), never an exception
    assert not by_key["c.docx"].ok and by_key["c.docx"].error
    good, dead = dead_letter_split(out)
    assert good.count() == 2 and dead.count() == 1


def test_merge_pdf_parts_order_and_cover(spark):
    from kommunedata_data_pipeline_spark.transforms import pdfmini

    pa = pdfmini.text_to_pdf("part A")
    pb = pdfmini.text_to_pdf("part B")
    pc = pdfmini.text_to_pdf("part C")
    parts = spark.createDataFrame(
        [("m1", 2, pb), ("m1", 1, pa), ("m1", 3, pc), ("m2", 1, pdfmini.text_to_pdf("X"))],
        "doc_key string, part_no int, content binary",
    )
    out = {r.doc_key: r for r in merge_pdf_parts(parts).collect()}
    assert out["m1"].n_parts == 3
    merged = bytes(out["m1"].content)
    assert pdfmini.is_pdf(merged)
    # cover page + 3 parts = 4 pages, parts in part_no order after the cover
    assert pdfmini.page_count(merged) == 4
    text = pdfmini.extract_text(merged)
    assert "Deltagere:" in text
    assert text.index("part A") < text.index("part B") < text.index("part C")
    assert pdfmini.page_count(bytes(out["m2"].content)) == 2


def test_print_html_to_pdf_strips_chrome(spark):
    from kommunedata_data_pipeline_spark.transforms import pdfmini
    from kommunedata_data_pipeline_spark.transforms.documents import (
        print_html_to_pdf,
    )

    html = (
        '<html><body><div id="CookieConsent">accept cookies</div>'
        '<header class="c-site-header">NAVIGATION</header>'
        "<main><p>Referat fra mødet</p></main>"
        '<footer class="c-site-footer">footer junk</footer></body></html>'
    )
    pages = spark.createDataFrame([("p1", html), ("p2", None)], "doc_key string, html string")
    out = {r.doc_key: r for r in print_html_to_pdf(pages).collect()}
    blob = bytes(out["p1"].content)
    assert out["p1"].ok and pdfmini.is_pdf(blob) and pdfmini.page_count(blob) == 1
    text = pdfmini.extract_text(blob)
    assert "Referat fra m" in text
    for junk in ("NAVIGATION", "accept cookies", "footer junk"):
        assert junk not in text
    # empty page renders to an empty (but valid) PDF
    assert out["p2"].ok and pdfmini.is_pdf(bytes(out["p2"].content))


def test_sniff_format():
    assert sniff_format(make_png(4, 3)) == "png"
    assert sniff_format(make_wav(44100, 2)) == "wav"
    assert sniff_format(b"%PDF-1.7 ...") == "pdf"
    assert sniff_format(b"\xff\xd8\xff\xe0junk") == "jpeg"
    assert sniff_format(None) == "empty"
    assert sniff_format(b"????????") == "unknown"


def test_extract_media_meta(spark):
    df = spark.createDataFrame(
        [("p1", make_png(640, 480)), ("w1", make_wav(16000, 1)), ("u1", b"xx")],
        "media_id string, content binary",
    )
    got = {r.media_id: r for r in extract_media_meta(df).collect()}
    assert (got["p1"].fmt, got["p1"].width, got["p1"].height) == ("png", 640, 480)
    assert (got["w1"].fmt, got["w1"].sample_rate, got["w1"].channels) == ("wav", 16000, 1)
    assert got["u1"].fmt == "unknown"


def test_extract_features_deterministic(spark):
    df = spark.createDataFrame(
        [("a", make_png(2, 2)), ("b", make_png(2, 2))],
        "media_id string, content binary",
    )
    rows = extract_features(df, dim=8).collect()
    feats = {r.media_id: r.features for r in rows}
    assert feats["a"] == feats["b"]  # same bytes → same features
    assert len(feats["a"]) == 8 and all(0.0 <= v < 1.0 for v in feats["a"])


def test_sample_frames_shape_and_determinism(spark):
    import hashlib

    from kommunedata_data_pipeline_spark.transforms.multimodal import (
        make_png,
        sample_frames,
    )

    blob = make_png(16, 8)
    df = spark.createDataFrame(
        [("m1", bytearray(blob)), ("m2", None)],
        "media_id string, content binary",
    )
    rows = sorted(
        sample_frames(df, n_frames=3).collect(),
        key=lambda r: (r.media_id, r.frame_idx),
    )
    # 1 row in -> n_frames rows out, for real AND null blobs
    assert len(rows) == 6
    m1 = [r for r in rows if r.media_id == "m1"]
    dur = 1000 + (len(blob) * 37) % 9000
    assert [r.t_ms for r in m1] == [0, dur // 3, (2 * dur) // 3]
    assert all(r.fmt == "png" and r.n_frames == 3 for r in m1)
    # fingerprint is the documented pure function of (id, t_ms)
    expect = int(hashlib.md5(f"m1#{dur // 3}".encode()).hexdigest()[:8], 16)
    assert m1[1].frame_fp == expect
    # null blob: empty format, minimum duration, frames still emitted
    m2 = [r for r in rows if r.media_id == "m2"]
    assert all(r.fmt == "empty" for r in m2)
    assert [r.t_ms for r in m2] == [0, 333, 666]
