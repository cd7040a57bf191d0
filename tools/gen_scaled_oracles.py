"""Rewrite the literal-pinned g-query oracles to SCALE-KEYED form.

Input: a pin JSON from tools/pin_oracle_literals.py (values verified
identical across two parallelism settings). Each oracle keeps its
SELECT head (casts/aliases) and ORDER BY, but its VALUES table gains a
leading `sf_key` column — the `orders` row count, unique per SF and
readable by DuckDB — filtered with
`WHERE sf_key = (SELECT count(*) FROM orders)`, so ONE oracle string
grades every testdata scale.

The rewrite is mechanical over driver_queries.py's uniform register
blocks; review the diff with git before committing.

Usage: python tools/gen_scaled_oracles.py pinned.json
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DQ = os.path.join(REPO, "gtfs_osm_sync_spark", "driver_queries.py")


def lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (int,)):
        return str(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def rebuild(sql: str, rows_by_key: dict[str, list]) -> str:
    head, rest = sql.split(" FROM (VALUES", 1)
    m = re.search(r"\)\s*\n?\s*AS t\(([^)]*)\)\s*(ORDER BY .*)?$", rest, re.S)
    if not m:
        raise ValueError(f"unparsed oracle shape:\n{sql}")
    colnames = m.group(1).strip()
    order = (m.group(2) or "").strip()
    vals = []
    for key in sorted(rows_by_key, key=int):
        for row in rows_by_key[key]:
            vals.append(f"      ({key}, {', '.join(lit(v) for v in row)})")
    body = ",\n".join(vals)
    out = (
        f"{head.rstrip()} FROM (VALUES\n{body})\n"
        f"      AS t(sf_key, {colnames})\n"
        f"    WHERE sf_key = (SELECT count(*) FROM orders)\n"
    )
    if order:
        out += f"    {order}\n"
    return out


def main() -> int:
    pins = json.load(open(sys.argv[1]))
    src = open(DQ).read()
    n = 0
    for name, rows_by_key in pins.items():
        pat = re.compile(
            r'(@register\(\n    "' + re.escape(name) + r'",\n    """\n)(.*?)(\n?    """,\n\))',
            re.S,
        )
        m = pat.search(src)
        if not m:
            print(f"SKIP {name}: register block not found")
            continue
        new_sql = rebuild(m.group(2).strip("\n"), rows_by_key)
        src = src[: m.start()] + m.group(1) + "    " + new_sql.strip("\n") + m.group(3) + src[m.end():]
        n += 1
    with open(DQ, "w") as f:
        f.write(src)
    print(f"rewrote {n}/{len(pins)} oracles in {DQ}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
