#!/usr/bin/env python3
"""Harvest every embedded SQL statement from the reference's prompt files.

The reference's generators carry their gold/few-shot SQL inline in Python
string literals (DINSQLGenerate.py few-shot banks, DAILSQLGenerate.py
selector examples, CHESSPrompt.py walkthroughs, MACSQLGenerate.py decomposer
examples, the LinkAlign prompt store, ...). Those strings are the *actual*
SQL text the reference's actors emit and parse — which makes them the
strongest available conformance corpus for our dialect layer: if
``transpile.py`` + ``spark.sql`` handle 100% of them, the engine survives
what the reference's generators really produce (r5 verdict task #1).

This script regenerates ``tests/fixtures/reference_sql_corpus.json`` from a
read-only scan of ``/root/reference``. Run it only when the reference
changes; the fixture is committed so the test suite never depends on the
reference being present.

Extraction strategy (per Python string literal, found via ``ast``):
  1. fenced ```sql blocks whose body starts with SELECT/WITH;
  2. single-line statements after an explicit ``SQL:``-style marker;
  3. lines that themselves start with SELECT/WITH (after stripping
     markdown bullets/quotes), accumulated across continuation lines
     while parens stay unbalanced or the next line starts with a SQL
     continuation keyword.
Candidates are kept only if they contain a FROM clause, have balanced
parens/quotes, and carry no ``{...}`` template placeholders (those are
format-string holes, not executable SQL).
"""

from __future__ import annotations

import ast
import json
import os
import re
import sys

REF_ROOT = "/root/reference"
OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "reference_sql_corpus.json",
)

# markers the reference's prompt prose uses to introduce a SQL line
_MARKER = re.compile(
    r"(?:\bSQL\b[^:\n]{0,20}:|\bPseudo SQL:\*{0,2}|\bFinal(?:\s+Optimized)?\s+SQL\b[^:\n]{0,20}:)"
    r"\s*\*{0,2}\s*`?\s*(SELECT\b.*|WITH\b.*)$",
    re.IGNORECASE,
)
_LINE_START = re.compile(r"^(?:[-*>#\s`\"']*)(SELECT\s.*|WITH\s.*)$", re.IGNORECASE)
_CONTINUATION = re.compile(
    r"^\s*(?:FROM|WHERE|GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|JOIN|INNER|LEFT|RIGHT|"
    r"FULL|CROSS|ON\b|AND\b|OR\b|UNION|INTERSECT|EXCEPT|SELECT|WITH|CASE|WHEN|"
    r"THEN|ELSE|END|OFFSET|VALUES|\)|\()",
    re.IGNORECASE,
)
_FENCE = re.compile(r"```(?:sql)?\s*\n(.*?)```", re.DOTALL | re.IGNORECASE)


def _balanced(sql: str) -> bool:
    no_lit = re.sub(r"'(?:[^']|'')*'", "''", sql)
    if no_lit.count("'") % 2:
        return False
    depth = 0
    for ch in no_lit:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


def _clean(sql: str) -> str | None:
    sql = sql.strip()
    # trailing Python/JSON string artifacts the literal context leaves behind
    sql = re.sub(r"""["'],?\s*$""", "", sql).strip()
    # trailing markdown backtick: strip only when removal restores balance
    # (a statement legitimately ends with `ident` -> even count, keep it)
    if sql.endswith("`") and sql.count("`") % 2 == 1:
        sql = sql[:-1].strip()
    sql = re.sub(r"\s*;\s*$", "", sql)
    # trailing markdown/prose artifacts
    sql = re.sub(r"\s*(?:\*/|\*\*|--+)\s*$", "", sql).strip()
    if not re.match(r"(?is)^(SELECT|WITH)\b", sql):
        return None
    if not re.search(r"(?is)\bFROM\b", sql):
        return None  # prose fragment ("SELECT the name ...")
    if re.search(r"(?is)\b(?:FROM|WHERE|AND|OR|ON|BY|SELECT|IN)\s*$", sql):
        return None  # truncated mid-statement
    if re.search(r"\{[^}]*\}", sql) or "..." in sql:
        return None  # format-string / ellipsis template hole
    # pseudo-SQL placeholder like <previous sub-query> or <score = 100>:
    # '<' immediately followed by a non-space (real comparisons are written
    # spaced in the corpus: "salary < 100000")
    if re.search(r"<[^\s<>][^<>]{0,100}>", sql):
        return None
    # engine-catalog introspection, not dialect surface
    if re.search(r"(?i)\b(sqlite_master|information_schema|pg_catalog)\b", sql):
        return None
    if not _balanced(sql):
        return None
    if sql.count("`") % 2:
        return None  # unbalanced quoting from a truncated capture
    if len(sql) < 20:
        return None
    return sql


def _from_string(text: str) -> list[str]:
    found: list[str] = []
    # 1. fenced blocks
    fence_spans: list[tuple[int, int]] = []
    for m in _FENCE.finditer(text):
        fence_spans.append(m.span())
        body = m.group(1).strip()
        if re.match(r"(?is)^(SELECT|WITH)\b", body):
            c = _clean(re.sub(r"\s*\n\s*", " ", body))
            if c:
                found.append(c)

    def in_fence(pos: int) -> bool:
        return any(a <= pos < b for a, b in fence_spans)

    # 2/3. line-based extraction outside fences
    lines = text.split("\n")
    offsets: list[int] = []
    pos = 0
    for ln in lines:
        offsets.append(pos)
        pos += len(ln) + 1
    i = 0
    while i < len(lines):
        line = lines[i]
        if in_fence(offsets[i]):
            i += 1
            continue
        m = _MARKER.search(line)
        stmt: str | None = None
        if m:
            stmt = m.group(1)
        else:
            m2 = _LINE_START.match(line)
            if m2 and not re.search(r"(?i)\bselect\s+(the|a|an|all\s+the)\b", line):
                stmt = m2.group(1)
        if stmt is None:
            i += 1
            continue
        # accumulate continuation lines
        j = i + 1
        while j < len(lines) and not in_fence(offsets[j]):
            nxt = lines[j]
            if not nxt.strip():
                break
            if _MARKER.search(nxt) or _LINE_START.match(nxt):
                break
            if _balanced(stmt) and not _CONTINUATION.match(nxt):
                break
            if not _balanced(stmt) or _CONTINUATION.match(nxt):
                stmt += " " + nxt.strip()
                j += 1
                continue
            break
        c = _clean(re.sub(r"\s+", " ", stmt))
        if c:
            found.append(c)
        i = j if j > i + 1 else i + 1
    return found


def harvest() -> list[dict]:
    entries: list[dict] = []
    seen: set[str] = set()
    for dirpath, _dirnames, filenames in sorted(os.walk(os.path.join(REF_ROOT, "core"))):
        for fname in sorted(filenames):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            try:
                tree = ast.parse(open(path, encoding="utf-8", errors="replace").read())
            except SyntaxError:
                continue
            rel = os.path.relpath(path, REF_ROOT)
            for node in ast.walk(tree):
                if isinstance(node, ast.Constant) and isinstance(node.value, str):
                    if "SELECT" not in node.value.upper():
                        continue
                    for sql in _from_string(node.value):
                        key = re.sub(r"\s+", " ", sql).strip().lower()
                        if key in seen:
                            continue
                        seen.add(key)
                        entries.append({"source": f"{rel}:{node.lineno}", "sql": sql})
    return entries


def main() -> None:
    entries = harvest()
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(entries, fh, indent=1)
    by_file: dict[str, int] = {}
    for e in entries:
        by_file[e["source"].split(":")[0]] = by_file.get(e["source"].split(":")[0], 0) + 1
    print(f"harvested {len(entries)} unique statements -> {OUT_PATH}", file=sys.stderr)
    for f, n in sorted(by_file.items(), key=lambda kv: -kv[1]):
        print(f"  {n:4d}  {f}", file=sys.stderr)


if __name__ == "__main__":
    main()
