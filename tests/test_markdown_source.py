"""Markdown folder source: front-matter parsing paths
(reference behavior: wurzel/datacontract/common.py:101-147)."""

from wurzel_spark.contracts import MARKDOWN_DOC
from wurzel_spark.sources.markdown import doc_metrics, read_markdown_folder


def test_reads_all_files_recursively(spark, md_folder):
    df = read_markdown_folder(spark, md_folder)
    assert df.count() == 5  # incl. nested/deep.md


def test_front_matter_supplies_fields(spark, md_folder):
    rows = {r["keywords"]: r for r in read_markdown_folder(spark, md_folder).collect()}
    r = rows["bread,butter"]
    assert r["url"] == "some/file/path.md"
    assert r["md"].startswith("# Title")
    assert r["metadata"]["token_len"] == "123"


def test_defaults_stem_and_path(spark, md_folder):
    rows = {r["keywords"]: r for r in read_markdown_folder(spark, md_folder, url_prefix="pfx:").collect()}
    r = rows["plain"]  # keywords default = filename stem (common.py:146)
    assert r["url"].startswith("pfx:/")
    assert r["metadata"] is None


def test_invalid_yaml_strips_fence_keeps_defaults(spark, md_folder):
    """Reference semantics (common.py:116-131, md_test.py case
    '\\t url:'): a matching front-matter FENCE is always stripped from
    the body; a YAML parse failure only resets the metadata, so
    keywords/url fall back to stem/path defaults."""
    rows = {r["keywords"]: r for r in read_markdown_folder(spark, md_folder).collect()}
    r = rows["bad_yaml"]  # keywords default = filename stem
    assert r["md"].startswith("# Broken")
    assert r["metadata"] is None


def test_deprecated_topics_key(spark, md_folder):
    kws = {r["keywords"] for r in read_markdown_folder(spark, md_folder).collect()}
    assert "legacy,keys" in kws  # topics → keywords (common.py:133-139)


def test_contract_validates(spark, md_folder):
    df = read_markdown_folder(spark, md_folder)
    MARKDOWN_DOC.validate(df)


def test_doc_metrics(spark, md_folder):
    df = read_markdown_folder(spark, md_folder)
    m = {r["url"]: r for r in doc_metrics(df).collect()}
    r = m["some/file/path.md"]
    assert r["md_char_len"] > 0
    assert r["keywords_count"] == 2


def test_reference_md_parsing_case_table(spark, tmp_path):
    """The reference's 9-case front-matter table (md_test.py:11-52),
    verbatim: url/keywords defaults, tab-indented invalid YAML, url-like
    text in the body, deprecated handling."""
    cases = [
        ("---\n\nurl: myurl\n---\nText", "myurl", ""),
        ("---\n\n   url: myurl\n---\nText", "myurl", ""),
        ("---\n\n\t url: myurl\n---\nText", "", ""),  # invalid YAML
        ("---\nurl: myurl\n---\nText", "myurl", ""),
        ("---\n\nurl: myurl\n\nkeywords: bread\n---\nText", "myurl", "bread"),
        ("---\n\nurl: myurl\n\nkeywords: bread,butter\n---\nText", "myurl", "bread,butter"),
        ("---\n\n\nkeywords: bread,butter\n---\nText", "", "bread,butter"),
        ("---\n\n\nkeywords: bread,butter\n\n---\nText\nurl:url_body", "", "bread,butter"),
        ("---\n\n\nkeywords: bread,butter\nurl: url_header\n---\nText", "url_header", "bread,butter"),
    ]
    for i, (md, url, bread) in enumerate(cases):
        d = tmp_path / f"case{i}"
        d.mkdir()
        (d / "file.md").write_text(md)
        r = read_markdown_folder(spark, str(d), url_prefix="SPACE/").collect()[0]
        if url:
            assert r["url"] == url, i
        else:
            assert r["url"].startswith("SPACE/") and r["url"].endswith("file.md"), i
        assert r["keywords"] == (bread or "file"), i
        expected_md = "Text\nurl:url_body" if "url:url_body" in md else "Text"
        assert r["md"] == expected_md, (i, r["md"])
        assert r["metadata"] is None, i
