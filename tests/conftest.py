import pytest

from wurzel_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture()
def md_folder(tmp_path):
    """Markdown corpus exercising the front-matter paths (FIXTURES §1)."""
    (tmp_path / "with_fm.md").write_text(
        "---\nkeywords: \"bread,butter\"\nurl: \"some/file/path.md\"\n"
        "metadata:\n  token_len: 123\n  char_len: 550\n---\n# Title\n\nBody text here.\n"
    )
    (tmp_path / "plain.md").write_text("# Plain\n\nNo front matter at all.\n")
    (tmp_path / "bad_yaml.md").write_text(
        "---\n: [unparseable\n---\n# Broken\n\nStill a document.\n"
    )
    (tmp_path / "topics_key.md").write_text(
        "---\ntopics: \"legacy,keys\"\n---\n# Deprecated topics key\n\nx\n"
    )
    sub = tmp_path / "nested"
    sub.mkdir()
    (sub / "deep.md").write_text("# Deep\n\nnested file\n")
    return str(tmp_path)
