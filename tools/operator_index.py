"""Regenerate OPERATORS.md: one row per registered query with its
implementation location, summary, and oracle status.

Usage: python tools/operator_index.py > OPERATORS.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from big_data_project_spark.registry import ORACLES, QUERIES


def main() -> None:
    print("# Operator index\n")
    print(
        "Auto-generated (`python tools/operator_index.py`): every entry "
        "in `queries()`,\nits implementation, and whether the driver's "
        "DuckDB oracle gate covers it\n(rows-only entries are bounded "
        "against exact results in unit tests instead).\n"
    )
    print("| query | module.function | oracle | summary |")
    print("|---|---|---|---|")
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        mod = fn.__module__.replace("big_data_project_spark.", "")
        doc = (fn.__doc__ or "").strip().split("\n")[0].rstrip(".")
        oracle = "full" if name in ORACLES else "rows-only"
        print(f"| `{name}` | `{mod}.{fn.__name__}` | {oracle} | {doc} |")


if __name__ == "__main__":
    main()
