"""Regenerate OPERATORS.md — the registry-derived operator inventory.

Run: python tools/gen_operators_md.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from sfdc_cdc_aws_spark.registry import load_all  # noqa: E402


def first_line(doc: str) -> str:
    for line in (doc or "").strip().splitlines():
        line = line.strip()
        if line:
            return line.replace("|", "\\|")
    return ""


def main() -> None:
    specs = load_all()
    lines = [
        "# OPERATORS — registry inventory",
        "",
        "Generated from `sfdc_cdc_aws_spark.registry` by",
        "`tools/gen_operators_md.py`; every row is a driver-checkable",
        "query key (`__spark_entry__.queries()`), hash-verified against",
        "its DuckDB oracle unless marked rows-only.",
        "",
        f"**{len(specs)} queries**, "
        f"{sum(1 for s in specs.values() if s.oracle)} oracle-backed.",
        "",
        "| Query key | Implementation | Check | What it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        impl = f"`{s.fn.__module__.removeprefix('sfdc_cdc_aws_spark.')}.{s.fn.__name__}`"
        check = "oracle hash" if s.oracle else "rows-only"
        lines.append(f"| `{name}` | {impl} | {check} | {first_line(s.doc)} |")
    lines.append("")
    with open("OPERATORS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote OPERATORS.md ({len(specs)} queries)")


if __name__ == "__main__":
    main()
