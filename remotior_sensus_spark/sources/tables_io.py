"""Table file ingestion: CSV with delimiter sniffing + a pure-Python
DBF (dBase III/IV) reader.

Reference: core/table_manager.py:87-312 (open_file tries DBF via OGR,
CSV with a tab-then-comma separator list). No OGR in this sandbox, so
the DBF header/record layout is parsed directly from the spec; CSVs go
through spark.read.csv with the sniffed separator (schema inference
on, matching the reference's numpy dtype guessing).

Attribute tables are small (the reference materializes them as numpy
recarrays on one node); the DBF parse is driver-side by design, then
handed to Spark as a DataFrame for distributed joins.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

DELIMITERS = ("\t", ",", ";")


def sniff_delimiter(path: str, candidates: tuple[str, ...] = DELIMITERS) -> str:
    """Pick the candidate splitting the first line into the most fields
    (the reference's try-tab-then-comma generalized)."""
    with open(path, "r", errors="replace") as f:
        first = f.readline()
    best = max(candidates, key=lambda d: len(first.split(d)))
    return best if len(first.split(best)) > 1 else candidates[0]


def parse_dbf(path: str) -> tuple[list[tuple[str, str]], list[list]]:
    """Minimal dBase III/IV parser -> (fields [(name, type)], rows).
    Field types: C -> str, N/F -> int/float, L -> bool, D -> str."""
    with open(path, "rb") as f:
        data = f.read()
    n_records = struct.unpack_from("<I", data, 4)[0]
    header_size = struct.unpack_from("<H", data, 8)[0]
    record_size = struct.unpack_from("<H", data, 10)[0]
    fields = []
    off = 32
    while off < header_size - 1 and data[off] != 0x0D:
        # latin-1 never raises — non-ASCII field names (e.g. 'AÑO')
        # must not crash the parse
        name = data[off:off + 11].split(b"\0")[0].decode("latin-1")
        ftype = chr(data[off + 11])
        length = data[off + 16]
        decimals = data[off + 17]
        fields.append((name, ftype, length, decimals))
        off += 32
    rows = []
    pos = header_size
    for _ in range(n_records):
        rec = data[pos:pos + record_size]
        pos += record_size
        if not rec or rec[0:1] == b"*":  # deleted record
            continue
        vals = []
        o = 1
        for name, ftype, length, decimals in fields:
            raw = rec[o:o + length].decode("ascii", errors="replace").strip()
            o += length
            if ftype in ("N", "F"):
                if raw == "":
                    vals.append(None)
                elif decimals or ftype == "F" or "." in raw:
                    vals.append(float(raw))
                else:
                    vals.append(int(raw))
            elif ftype == "L":
                vals.append(raw.upper() in ("T", "Y"))
            else:
                vals.append(raw)
        rows.append(vals)
    return [(n, t) for n, t, _, _ in fields], rows


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Open a .csv/.txt (delimiter-sniffed, header + inferred schema) or
    .dbf table as a DataFrame (table_manager.open_file analogue)."""
    low = path.lower()
    if low.endswith(".dbf"):
        fields, rows = parse_dbf(path)
        # explicit schema from the DBF field descriptors: inference
        # would fail on zero-record files and on numeric columns that
        # are blank in every record (all-None -> 'cannot determine type')
        cols = list(zip(*rows)) if rows else [()] * len(fields)

        def sql_type(i: int, t: str) -> str:
            if t == "L":
                return "boolean"
            if t in ("N", "F"):
                vals = [v for v in cols[i] if v is not None]
                return ("double" if t == "F"
                        or any(isinstance(v, float) for v in vals)
                        else "bigint")
            return "string"

        types = [sql_type(i, t) for i, (_, t) in enumerate(fields)]
        ddl = ", ".join(f"`{n}` {ty}" for (n, _), ty in zip(fields, types))
        rows = [
            [float(v) if ty == "double" and isinstance(v, int) else v
             for v, ty in zip(r, types)]
            for r in rows
        ]
        return spark.createDataFrame(rows, ddl)
    sep = sniff_delimiter(path)
    return (
        spark.read.option("header", "true")
        .option("sep", sep)
        .option("inferSchema", "true")
        .csv(path)
    )
