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


def test_invalid_yaml_falls_back_to_whole_body(spark, md_folder):
    rows = {r["keywords"]: r for r in read_markdown_folder(spark, md_folder).collect()}
    r = rows["bad_yaml"]
    assert r["md"].startswith("---")  # whole file as md (common.py:117-131)


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
