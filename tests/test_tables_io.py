"""CSV delimiter sniffing + pure-Python DBF parsing
(ref core/table_manager.py:87-312)."""

import struct


def _make_dbf(tmp_path):
    """Craft a dBase III file per the spec: 2 fields (NAME C10, VAL N8.0),
    3 records, one flagged deleted."""
    fields = [(b"NAME", b"C", 10, 0), (b"VAL", b"N", 8, 0)]
    recs = [(b" ", b"alpha", 12), (b"*", b"gone", 99), (b" ", b"beta", -7)]
    n_fields = len(fields)
    header_size = 32 + 32 * n_fields + 1
    record_size = 1 + sum(f[2] for f in fields)
    head = bytearray(32)
    head[0] = 0x03
    struct.pack_into("<I", head, 4, len(recs))
    struct.pack_into("<H", head, 8, header_size)
    struct.pack_into("<H", head, 10, record_size)
    out = bytearray(head)
    for name, ftype, length, dec in fields:
        fd = bytearray(32)
        fd[0:len(name)] = name
        fd[11] = ftype[0]
        fd[16] = length
        fd[17] = dec
        out += fd
    out += b"\x0d"
    for flag, name, val in recs:
        out += flag
        out += name.ljust(10)[:10]
        out += str(val).rjust(8).encode()
    p = tmp_path / "attrs.dbf"
    p.write_bytes(bytes(out))
    return str(p)


def test_parse_dbf(tmp_path):
    from remotior_sensus_spark.sources.tables_io import parse_dbf

    path = _make_dbf(tmp_path)
    fields, rows = parse_dbf(path)
    assert [n for n, _ in fields] == ["NAME", "VAL"]
    assert rows == [["alpha", 12], ["beta", -7]]  # deleted record skipped


def test_read_dbf_as_dataframe(spark, tmp_path):
    from remotior_sensus_spark.sources.tables_io import read_table

    df = read_table(spark, _make_dbf(tmp_path))
    got = {r["NAME"]: r["VAL"] for r in df.collect()}
    assert got == {"alpha": 12, "beta": -7}


def test_csv_sniffing(spark, tmp_path):
    from remotior_sensus_spark.sources.tables_io import read_table, sniff_delimiter

    tab = tmp_path / "t.csv"
    tab.write_text("a\tb\tc\n1\t2\t3\n4\t5\t6\n")
    semi = tmp_path / "s.csv"
    semi.write_text("a;b\n7;8\n")
    assert sniff_delimiter(str(tab)) == "\t"
    assert sniff_delimiter(str(semi)) == ";"
    df = read_table(spark, str(tab))
    assert df.columns == ["a", "b", "c"] and df.count() == 2
    df2 = read_table(spark, str(semi))
    assert [r["b"] for r in df2.collect()] == [8]
