"""Regenerate QUERIES.md from the live registry.

Run from the repo root after any registry change (new entry, tier
rotation, tag/docstring edit):

    python3 tools/regen_queries_md.py

Keeps the hand-written preamble (everything above the table separator)
and rewrites the table from `squrve_spark.plans.REGISTRY` in driver
iteration order. Prints the tier counts to paste into README/SURVEY §2.F.
"""

from __future__ import annotations

import re

from squrve_spark.plans import REGISTRY


def tier_of(spec) -> str:
    if spec.oracle is not None and not spec.defer_oracle:
        return "driver"
    if spec.oracle is not None:
        return "deferred"
    return "rows-only"


def main() -> None:
    lines = []
    for i, (name, spec) in enumerate(REGISTRY.items()):
        doc = re.sub(r"\s+", " ", (spec.fn.__doc__ or "").strip())
        if len(doc) > 180:
            doc = doc[:177] + "..."
        tags = ",".join(spec.tags)
        lines.append(f"| {i} | `{name}` | {tier_of(spec)} | {tags} | {doc} |")

    header = open("QUERIES.md").read().split("|---|---|---|---|---|")[0]
    with open("QUERIES.md", "w") as fh:
        fh.write(header + "|---|---|---|---|---|\n" + "\n".join(lines) + "\n")

    counts = {"driver": 0, "deferred": 0, "rows-only": 0}
    for spec in REGISTRY.values():
        counts[tier_of(spec)] += 1
    print(counts, "total", len(REGISTRY))


if __name__ == "__main__":
    main()
