"""Dataset + schema management: the task-row IR and schema format converters.

Reference analog: /root/reference/core/data_manage.py — ``Dataset`` wraps an
ordered list of task-row dicts (the dataflow IR, SURVEY §3.4) with accessors,
sampling, a ``key-op-value`` filter DSL, and JSON persistence; schemas move
between the Spider-style *central* format and a file-per-column *parallel*
format. Here schemas are DERIVED from the Spark catalog (plus a PK/FK
sidecar — Spark has no constraint catalog) instead of sqlite introspection.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Any, Callable, Iterator, Optional

from pyspark.sql import SparkSession

# ---------------------------------------------------------------------------
# Dataset: ordered task rows


class Dataset:
    """Ordered list of task-row dicts; the unit of work for actors/tasks.

    Row fields follow the reference IR: instance_id, db_id, question, query
    (gold SQL), pred_sql, db_type, schema_links, sub_questions, gold_schemas,
    difficulty/db_size/ques_length/query_length, error_info.
    """

    def __init__(
        self,
        rows: Optional[list[dict]] = None,
        data_source: Optional[str] = None,
        sample: float | int | None = None,
        seed: int = 42,
    ):
        if rows is None and data_source:
            rows = json.loads(Path(data_source).read_text())
        self._rows: list[dict] = list(rows or [])
        if sample is not None and self._rows:
            k = (
                max(1, int(len(self._rows) * sample))
                if isinstance(sample, float) and sample <= 1
                else min(int(sample), len(self._rows))
            )
            self._rows = random.Random(seed).sample(self._rows, k)

    def __len__(self) -> int:
        return len(self._rows)

    def __getitem__(self, i: int) -> dict:
        return self._rows[i]

    def __setitem__(self, i: int, row: dict) -> None:
        self._rows[i] = row

    def __iter__(self) -> Iterator[dict]:
        return iter(self._rows)

    def setitem(self, i: int, key: str, value: Any) -> None:
        self._rows[i][key] = value

    def append(self, row: dict) -> None:
        self._rows.append(row)

    def save(self, path: str) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self._rows, indent=2, default=str))

    @classmethod
    def load(cls, path: str) -> "Dataset":
        return cls(data_source=path)

    def copy(self) -> "Dataset":
        return Dataset([dict(r) for r in self._rows])

    def merge(self, other: "Dataset") -> "Dataset":
        """Row-aligned merge: other's keys overwrite by instance position."""
        for i, row in enumerate(other):
            if i < len(self._rows):
                self._rows[i].update(row)
            else:
                self._rows.append(dict(row))
        return self


# filter DSL: "key-op-value" with ops l/e/m/le/me (reference
# data_manage.py:1482-1557); applies over numeric or string row fields.
_OPS: dict[str, Callable[[Any, Any], bool]] = {
    "l": lambda a, b: a < b,
    "e": lambda a, b: a == b,
    "m": lambda a, b: a > b,
    "le": lambda a, b: a <= b,
    "me": lambda a, b: a >= b,
}


def filter_dataset(ds: Dataset, predicates: list[str] | str) -> Dataset:
    """Filter rows with ``key-op-value`` predicates (all must hold)."""
    if isinstance(predicates, str):
        predicates = [predicates]
    parsed = []
    for p in predicates:
        key, op, value = p.split("-", 2)
        parsed.append((key, _OPS[op], value))
    out = []
    for row in ds:
        ok = True
        for key, op, value in parsed:
            have = row.get(key)
            if have is None:
                ok = False
                break
            v: Any = value
            if isinstance(have, (int, float)):
                v = type(have)(value)
            if not op(have, v):
                ok = False
                break
        if ok:
            out.append(row)
    return Dataset(out)


# ---------------------------------------------------------------------------
# schema formats

STAR_TABLE_IDX = -1  # central format: the `*` column sits at table index -1


def central_schema_from_catalog(
    spark: SparkSession,
    db_id: str,
    tables: list[str],
    primary_keys: dict[str, list[str]] | None = None,
    foreign_keys: list[tuple[str, str, str, str]] | None = None,
    descriptions: dict[str, str] | None = None,
) -> dict:
    """Build a Spider-style central schema dict from the Spark catalog.

    ``foreign_keys`` entries are (table, column, ref_table, ref_column);
    they resolve to column-index pairs as in the central format. The ``*``
    pseudo-column is emitted first at table index -1.
    """
    primary_keys = primary_keys or {}
    foreign_keys = foreign_keys or []
    descriptions = descriptions or {}

    col_names: list[list] = [[STAR_TABLE_IDX, "*"]]
    col_types: list[str] = ["text"]
    col_desc: list[str] = [""]
    index_of: dict[tuple[str, str], int] = {}
    for t_idx, table in enumerate(tables):
        for f in spark.table(table).schema.fields:
            index_of[(table, f.name)] = len(col_names)
            col_names.append([t_idx, f.name])
            col_types.append(f.dataType.simpleString())
            col_desc.append(descriptions.get(f"{table}.{f.name}", ""))

    pk_indexes: list = []
    for table, cols in primary_keys.items():
        idxs = [index_of[(table, c)] for c in cols if (table, c) in index_of]
        if len(idxs) == 1:
            pk_indexes.append(idxs[0])
        elif idxs:
            pk_indexes.append(idxs)  # composite PK kept as a list

    fk_pairs = [
        [index_of[(t, c)], index_of[(rt, rc)]]
        for t, c, rt, rc in foreign_keys
        if (t, c) in index_of and (rt, rc) in index_of
    ]

    return {
        "db_id": db_id,
        "db_type": "spark",
        "table_names_original": list(tables),
        "column_names_original": col_names,
        "column_types": col_types,
        "column_descriptions": col_desc,
        "primary_keys": pk_indexes,
        "foreign_keys": fk_pairs,
    }


def central_to_parallel(central: dict) -> list[dict]:
    """Central -> parallel format: one dict per real column with PK bool and
    FK rendered as '[ref_table(ref_col)]' fragments (reference
    data_manage.py:1604-1675 semantics, original implementation)."""
    tables = central["table_names_original"]
    cols = central["column_names_original"]
    types = central.get("column_types", [])
    descs = central.get("column_descriptions", [])

    flat_pks: set[int] = set()
    for pk in central.get("primary_keys", []):
        if isinstance(pk, list):
            flat_pks.update(pk)
        else:
            flat_pks.add(pk)

    fk_render: dict[int, list[str]] = {}
    for src, dst in central.get("foreign_keys", []):
        dt_idx, dc = cols[dst]
        fk_render.setdefault(src, []).append(f"[{tables[dt_idx]}({dc})]")

    out = []
    for i, (t_idx, col) in enumerate(cols):
        if t_idx == STAR_TABLE_IDX:
            continue
        out.append(
            {
                "db_id": central.get("db_id", ""),
                "db_type": central.get("db_type", "spark"),
                "table_name": tables[t_idx],
                "column_name": col,
                "column_types": types[i] if i < len(types) else "text",
                "column_descriptions": descs[i] if i < len(descs) else "",
                "primary_key": i in flat_pks,
                "foreign_key": "".join(fk_render.get(i, [])),
            }
        )
    return out


def save_parallel_schema(columns: list[dict], base_dir: str) -> list[str]:
    """Write the file-per-column tree: ``{base}/{db_id}/{table}_{column}.json``."""
    paths = []
    for col in columns:
        d = Path(base_dir) / col["db_id"]
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"{col['table_name']}_{col['column_name']}.json"
        p.write_text(json.dumps(col, indent=2))
        paths.append(str(p))
    return paths


def parallel_to_central(columns: list[dict]) -> dict:
    """Inverse transform (used when benchmarks ship parallel format)."""
    if not columns:
        return {}
    tables: list[str] = []
    for c in columns:
        if c["table_name"] not in tables:
            tables.append(c["table_name"])
    col_names: list[list] = [[STAR_TABLE_IDX, "*"]]
    col_types = ["text"]
    col_desc = [""]
    pks: list[int] = []
    for c in columns:
        idx = len(col_names)
        col_names.append([tables.index(c["table_name"]), c["column_name"]])
        col_types.append(c.get("column_types", "text"))
        col_desc.append(c.get("column_descriptions", ""))
        if c.get("primary_key"):
            pks.append(idx)
    return {
        "db_id": columns[0]["db_id"],
        "db_type": columns[0].get("db_type", "spark"),
        "table_names_original": tables,
        "column_names_original": col_names,
        "column_types": col_types,
        "column_descriptions": col_desc,
        "primary_keys": pks,
        "foreign_keys": [],
    }


def render_schema_ddl(columns: list[dict]) -> str:
    """Parallel-format columns -> the prompt DDL text shape the reference
    renders (utils.py:92-149): per-table column lists plus PK/FK sections."""
    by_table: dict[str, list[dict]] = {}
    for c in columns:
        by_table.setdefault(c["table_name"], []).append(c)
    lines = []
    for table, cols in by_table.items():
        rendered = []
        for c in cols:
            desc = (c.get("column_descriptions") or "")[:150]
            typ = (c.get("column_types") or "")[:150]
            entry = f"{c['column_name']} ({typ})" if typ else c["column_name"]
            if desc:
                entry += f"  -- {desc}"
            rendered.append(entry)
        lines.append(f"### Table = {table}, columns = [{', '.join(rendered)}]")
    pks = [f"{c['table_name']}.{c['column_name']}" for c in columns if c.get("primary_key")]
    if pks:
        lines.append("### Primary Keys: " + ", ".join(pks))
    fks = [
        f"{c['table_name']}.{c['column_name']} -> {c['foreign_key']}"
        for c in columns
        if c.get("foreign_key")
    ]
    if fks:
        lines.append("### Foreign Keys: " + ", ".join(fks))
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# TPC-H sidecar metadata for the driver-provided testdata


TPCH_PRIMARY_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
}

TPCH_FOREIGN_KEYS: list[tuple[str, str, str, str]] = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


# ---------------------------------------------------------------------------
# DataLoader: benchmark registry resolution


_REPO_ROOT = Path(__file__).resolve().parent.parent
_SYS_CONFIG_PATH = Path(__file__).resolve().parent / "sys_config.json"


def registry_from_sys_config(
    config: dict | str | Path | None = None,
    base_dir: str | Path | None = None,
) -> dict[str, dict]:
    """sys_config benchmark list -> DataLoader registry.

    Reference analog: the registry at config/sys_config.json:30-199 as read
    by ``init_benchmark_dataset`` (data_manage.py:841-916): each benchmark
    has a ``root_path``; sub-benchmarks resolve to
    ``{root}/{sub_id}/dataset.json`` (no-sub benchmarks to
    ``{root}/dataset.json``, registered here under the default split name
    ``dev``); a sub with ``use_local_external`` (or a benchmark-level
    ``external`` flag) carries an ``external`` docs dir whose files rows
    point at via relative ``external_path``. Relative root paths resolve
    against ``base_dir`` (default: this repo's root, where the packaged
    default registry's fixtures live).
    """
    if config is None:
        config = _SYS_CONFIG_PATH
    if isinstance(config, (str, Path)):
        config = json.loads(Path(config).read_text())
    base = Path(base_dir) if base_dir else _REPO_ROOT

    registry: dict[str, dict] = {}
    for meta in config.get("benchmark", []):
        root = Path(meta.get("root_path", ""))
        if not root.is_absolute():
            root = base / root
        splits: dict[str, dict] = {}
        if meta.get("has_sub"):
            for sub in meta.get("sub_data", []):
                sub_id = sub["sub_id"]
                ext = None
                if sub.get("use_local_external"):
                    ext = root / sub_id / "external"
                elif meta.get("external"):
                    ext = root / "external"
                splits[sub_id] = {
                    "path": str(root / sub_id / "dataset.json"),
                    "external_dir": str(ext) if ext else None,
                }
            ext = None
        else:
            ext = root / "external" if meta.get("external") else None
            splits["dev"] = {
                "path": str(root / "dataset.json"),
                "external_dir": str(ext) if ext else None,
            }
        registry[meta["id"]] = {
            "splits": splits,
            "db_type": meta.get("db_type", "spark"),
            "meta_info": meta.get("meta_info", ""),
        }
    return registry


class DataLoader:
    """Resolve ``"benchmark:split:filter"`` identifiers into Datasets.

    Reference analog: init_benchmark_dataset / generate_dataset
    (data_manage.py:841-916, 1442-1479) against the sys_config benchmark
    registry. The registry here maps benchmark -> split -> dataset JSON path
    plus optional per-benchmark metadata (schema path, db dir); the third
    identifier segment is the ``filter_dataset`` predicate DSL. With no
    caller-supplied registry, the packaged ``sys_config.json`` defaults
    apply (fixture benchmarks over the driver testdata), so reference-style
    configs (``"data_source": "tpch:dev:"``) run unmodified.

    Split values are either a bare JSON path (caller-built registries) or a
    ``{"path": ..., "external_dir": ...}`` dict (sys_config-derived); with
    an ``external_dir``, each row's relative ``external_path`` is rewritten
    to the absolute document location, ready for ``add_external``.
    """

    def __init__(
        self,
        registry: Optional[dict[str, dict]] = None,
        sample: float | int | None = None,
    ):
        self.registry = registry if registry is not None else registry_from_sys_config()
        self.sample = sample

    def resolve(self, identifier: str) -> Dataset:
        parts = (identifier + "::").split(":")
        bench, split, flt = parts[0], parts[1] or "dev", parts[2]
        if bench not in self.registry:
            raise KeyError(f"unknown benchmark {bench!r}")
        entry = self.registry[bench]
        splits = entry.get("splits", {})
        if split not in splits:
            raise KeyError(f"benchmark {bench!r} has no split {split!r}")
        spec = splits[split]
        path = spec["path"] if isinstance(spec, dict) else spec
        external_dir = spec.get("external_dir") if isinstance(spec, dict) else None
        ds = Dataset(data_source=path, sample=self.sample)
        for row in ds:
            row.setdefault("benchmark", bench)
            if "db_type" not in row:
                row["db_type"] = entry.get("db_type", "spark")
            if external_dir and row.get("external_path"):
                row["external_path"] = str(Path(external_dir) / row["external_path"])
        if flt:
            ds = filter_dataset(ds, flt.split(","))
        return ds

    def schema_path(self, bench: str) -> Optional[str]:
        return self.registry.get(bench, {}).get("schema")


def schema_diff(old_central: dict, new_central: dict) -> dict:
    """Schema drift report between two central-format snapshots: the
    continuous-ingestion guard (a crawl source changing its schema should
    fail loudly before a 100 TB write, not after).

    Returns {added_tables, removed_tables, added_columns, removed_columns,
    type_changes} with columns as 'table.column' strings and type_changes
    as (qualified, old_type, new_type). Pure metadata — no data scan.
    """
    def cols_of(c: dict) -> dict[str, str]:
        # ONE central-format traversal in this module: reuse
        # central_to_parallel (same star-skip and 'text' type fallback)
        if not c.get("column_names_original"):
            return {}
        return {
            f"{col['table_name']}.{col['column_name']}": col["column_types"]
            for col in central_to_parallel(c)
        }

    old_t = set(old_central.get("table_names_original", []))
    new_t = set(new_central.get("table_names_original", []))
    old_c = cols_of(old_central)
    new_c = cols_of(new_central)
    return {
        "added_tables": sorted(new_t - old_t),
        "removed_tables": sorted(old_t - new_t),
        "added_columns": sorted(set(new_c) - set(old_c)),
        "removed_columns": sorted(set(old_c) - set(new_c)),
        "type_changes": sorted(
            (q, old_c[q], new_c[q])
            for q in set(old_c) & set(new_c)
            if old_c[q] != new_c[q]
        ),
    }
