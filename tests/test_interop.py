"""Reference-artifact interop: JSON-array and pandas-CSV round trips."""

import json

from pyspark.sql import types as T

from wurzel_spark import interop


def test_contract_json_round_trip(spark, tmp_path):
    rows = [
        {"md": "# A\n\nbody", "keywords": "k1,k2", "url": "u/a.md", "metadata": {"x": "1"}},
        {"md": "# B", "keywords": None, "url": "u/b.md", "metadata": None},
    ]
    p = tmp_path / "step_out.json"
    p.write_text(json.dumps(rows))
    df = interop.read_contract_json(spark, str(p))
    got = sorted((r["md"], r["url"]) for r in df.collect())
    assert got == [("# A\n\nbody", "u/a.md"), ("# B", "u/b.md")]
    assert df.schema == interop.MARKDOWN_CONTRACT_SCHEMA

    out = tmp_path / "rewritten.json"
    interop.write_contract_json(df, str(out))
    back = json.loads(out.read_text())
    assert len(back) == 2 and back[0]["md"].startswith("# A")
    # re-readable by the same reader (full round trip)
    again = interop.read_contract_json(spark, str(out))
    assert again.count() == 2


def test_pandera_csv_round_trip_with_vector_cells(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("text", T.StringType(), True),
            T.StructField("url", T.StringType(), True),
            T.StructField("vector", T.ArrayType(T.DoubleType()), True),
        ]
    )
    df = spark.createDataFrame(
        [("a", "u/a", [0.1, 0.2]), ("b", "u/b", [0.3, 0.4])], schema
    )
    p = tmp_path / "embedded.csv"
    interop.write_pandera_csv(df, str(p))
    # the reference's literal_eval path accepts the cell text
    import ast
    import csv

    with open(p, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    assert ast.literal_eval(rows[0]["vector"]) == [0.1, 0.2]

    back = interop.read_pandera_csv(spark, str(p), schema)
    got = {r["text"]: r["vector"] for r in back.collect()}
    assert got == {"a": [0.1, 0.2], "b": [0.3, 0.4]}


def test_read_reference_style_python_literal_csv(spark, tmp_path):
    # pandas to_csv writes Python list literals with single quotes for
    # strings — the reader must normalize them
    p = tmp_path / "ref.csv"
    p.write_text('text,splits\nhello,"[\'s1\', \'s2\']"\n')
    schema = T.StructType(
        [
            T.StructField("text", T.StringType(), True),
            T.StructField("splits", T.ArrayType(T.StringType()), True),
        ]
    )
    df = interop.read_pandera_csv(spark, str(p), schema)
    r = df.collect()[0]
    assert r["splits"] == ["s1", "s2"]

def test_read_literal_csv_with_apostrophes_and_escapes(spark, tmp_path):
    # cells whose string elements contain apostrophes / quotes — a blanket
    # '->" rewrite corrupts these; the literal_eval kernel must win.
    # Build the fixture the way pandas to_csv does: repr() the list, let
    # the csv module handle CSV quoting.
    import csv

    vals = {
        "a": ["it's fine", 'say "hi"'],
        "b": ["double's", "mixed, comma"],
    }
    p = tmp_path / "ref_quotes.csv"
    with open(p, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["text", "splits"])
        for k, v in vals.items():
            w.writerow([k, repr(v)])
    schema = T.StructType(
        [
            T.StructField("text", T.StringType(), True),
            T.StructField("splits", T.ArrayType(T.StringType()), True),
        ]
    )
    got = {r["text"]: r["splits"] for r in interop.read_pandera_csv(spark, str(p), schema).collect()}
    assert got == vals
