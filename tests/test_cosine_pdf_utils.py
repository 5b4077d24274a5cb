"""Cosine-cluster extraction, PDF kernel plumbing, scalar text utils."""

import numpy as np
import pyarrow as pa
import pytest

from crawl4ai_ray.functions.text_utils import (
    escape_json_string,
    extract_xml_data,
    sanitize_input_encode,
    split_and_parse_json_objects,
    truncate,
)
from crawl4ai_ray.stages.cosine_extract import (
    CosineClusterExtract,
    HashingEmbedder,
    _agglomerative_cosine,
)
from crawl4ai_ray.stages.pdf_extract import (
    NaivePdfDecoder,
    PdfExtractStage,
    is_pdf,
    make_fake_pdf,
    pdf_pages_to_markdown,
)


class TestCosineExtract:
    def test_embedder_deterministic_and_normalized(self):
        e = HashingEmbedder(32)
        a = e.encode(["hello world", "hello world", "other text"])
        assert np.allclose(a[0], a[1])
        assert not np.allclose(a[0], a[2])
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)

    def test_clustering_groups_similar(self):
        e = HashingEmbedder(64)
        texts = ["apple banana fruit salad"] * 3 + ["quantum physics electron"] * 3
        emb = e.encode(texts)
        labels = _agglomerative_cosine(emb, max_dist=0.4)
        assert len(set(labels[:3])) == 1
        assert len(set(labels[3:])) == 1
        assert labels[0] != labels[3]

    def test_stage_output_schema(self):
        stage = CosineClusterExtract(word_count_threshold=3, chunk_window=5)
        words_a = " ".join(["alpha beta gamma delta"] * 5)
        batch = pa.table({"url": ["u1", "u2"], "text": [words_a, ""]})
        out = stage(batch)
        assert out.column_names == ["url", "cluster_id", "n_chunks", "word_count", "text"]
        assert set(out.column("url").to_pylist()) <= {"u1"}
        assert out.num_rows >= 1

    def test_semantic_filter(self):
        stage = CosineClusterExtract(
            word_count_threshold=2,
            chunk_window=8,
            semantic_filter="fruit apple banana",
            sim_threshold=0.2,
        )
        batch = pa.table(
            {
                "url": ["u"],
                "text": ["apple banana fruit tasty snack " * 4],
            }
        )
        out = stage(batch)
        assert out.num_rows >= 1

    def test_actor_pool_runs(self, ray_session):
        import ray.data as rd

        ds = rd.from_items(
            [{"url": f"u{i}", "text": "word " * 60} for i in range(8)]
        )
        out = ds.map_batches(
            CosineClusterExtract,
            fn_constructor_kwargs={"word_count_threshold": 10},
            batch_format="pyarrow",
            concurrency=2,
        ).to_pandas()
        assert len(out) == 8


class TestPdf:
    def test_legacy_fake_roundtrip(self):
        payload = make_fake_pdf(["page one text", "page two text"])
        assert is_pdf(payload)
        pages = NaivePdfDecoder().decode(payload)
        assert [p["text"] for p in pages] == ["page one text", "page two text"]
        assert pages[0]["width"] == 612

    def test_real_pdf_roundtrip(self):
        from crawl4ai_ray.functions.pdfmini import read_pdf, write_pdf

        pages = ["Line one\nline two (parens) \\ slash", "Ünïcode — 中文", ""]
        pdf = write_pdf(pages, width=500, height=700, with_image=True)
        assert is_pdf(pdf)
        out = read_pdf(pdf)
        assert [p["text"] for p in out] == pages
        assert all(p["n_images"] == 1 for p in out)
        assert out[0]["width"] == 500 and out[0]["height"] == 700

    def test_real_pdf_flate_trailing_cr_byte(self):
        # streams whose compressed bytes end in 0x0d must not lose that
        # byte to the endstream delimiter (exact /Length slicing)
        from crawl4ai_ray.functions.pdfmini import read_pdf, write_pdf

        for i in range(300):
            text = f"probe {i} " + "z" * (i % 37)
            pdf = write_pdf([text])
            assert read_pdf(pdf)[0]["text"] == text

    def test_real_pdf_rejects_garbage(self):
        import pytest

        from crawl4ai_ray.functions.pdfmini import PdfError, read_pdf

        with pytest.raises(PdfError):
            read_pdf(b"%PDF-1.4\nnothing here")
        with pytest.raises(PdfError):
            read_pdf(b"GIF89a not a pdf")

    def test_stage_explodes_pages(self):
        from crawl4ai_ray.functions.pdfmini import write_pdf

        stage = PdfExtractStage()
        batch = pa.table(
            {
                "url": ["a", "b", "c"],
                "payload": [
                    write_pdf(["x"]),
                    write_pdf(["y1", "y2"]),
                    b"not a pdf",
                ],
            }
        )
        out = stage(batch)
        assert out.num_rows == 3
        assert out.column("url").to_pylist() == ["a", "b", "b"]
        assert out.column("page").to_pylist() == [1, 1, 2]

    def test_real_pdf_raises_not_implemented(self):
        with pytest.raises(NotImplementedError):
            NaivePdfDecoder().decode(b"%PDF-1.4\nreal pdf bytes")

    def test_markdown_render(self):
        md = pdf_pages_to_markdown(
            [{"page": 1, "text": "a   b"}, {"page": 2, "text": "c"}]
        )
        assert md == "## Page 1\n\na b\n\n## Page 2\n\nc"


class TestTextUtils:
    def test_sanitize(self):
        assert sanitize_input_encode(None) == ""
        assert sanitize_input_encode(b"caf\xc3\xa9") == "café"
        assert sanitize_input_encode(b"\xff\xfe") == "��"
        assert sanitize_input_encode(12) == "12"

    def test_escape_json(self):
        assert escape_json_string('a"b\n') == 'a\\"b\\n'
        assert escape_json_string(None) == ""

    def test_extract_xml(self):
        # reference semantics: bare tags only (attributes don't match),
        # longest occurrence wins
        body = "<name> Alice </name><skip/><age>7</age><name>Bobby Tables</name>"
        assert extract_xml_data(["name", "age", "missing"], body) == {
            "name": "Bobby Tables",
            "age": "7",
            "missing": "",
        }

    def test_split_json(self):
        # reference semantics: brace scan ignores strings, so a '}' inside
        # a JSON string value truncates that segment (lands in bad)
        parsed, bad = split_and_parse_json_objects(
            'noise {"a": 1} mid {"b": {"c": "}"}} tail {broken'
        )
        assert parsed == [{"a": 1}]
        assert bad == ['{"b": {"c": "}"}']

    def test_truncate(self):
        assert truncate("abcdef", 10) == "abcdef"
        # reference appends the marker after the slice
        assert truncate("abcdefghij", 8) == "abcdefgh..."
