"""DAIL-SQL prompt representations: the REPR_TYPE / EXAMPLE_TYPE registry.

Reference analog (algorithm shape, not code): the prompt-class family in
/root/reference/core/actor/generator/DAILSQLGenerate.py — REPR_TYPE enum
:314-333, EXAMPLE_TYPE enum :335-341, the ~20 prompt classes :910-1255, the
example-style classes :1255-1305, and ``prompt_factory`` :1741+. The
reference multiplies five base question representations (code / text /
number-sign / baseline / instruction) by modifier axes (with foreign keys,
with/without rule sentence, chain-of-thought, case-based reasoning); rather
than twenty near-duplicate classes, this module renders each name from its
(base, modifiers) decomposition — same prompt shapes, one renderer.

Schema input is engine-native: ``tables`` is ``[(table_name, [col, ...]),
...]`` derived from the Spark catalog (``central_schema_from_catalog``),
with optional ``foreign_keys`` rendered by the WFK variants. Prompts speak
Spark SQL (the reference's db_type-specific wording collapsed to the one
backend, as everywhere else in this repo).
"""

from __future__ import annotations

from typing import Optional

# enum strings exactly as the reference spells them (DAILSQLGenerate.py:314-341)


class REPR_TYPE:
    CODE_REPRESENTATION = "SQL"
    TEXT_REPRESENTATION = "TEXT"
    OPENAI_DEMOSTRATION = "NUMBERSIGN"
    BASIC = "BASELINE"
    ALPACA_SFT = "INSTRUCTION"
    OPENAI_DEMOSTRATION_WFK = "NUMBERSIGNWFK"
    BASIC_WOFK = "BASELINEWOFK"
    TEXT_REPRESENTATION_WFK = "TEXTWFK"
    ALPACA_SFT_WFK = "INSTRUCTIONWFK"
    OPENAI_DEMOSTRATION_WORULE = "NUMBERSIGNWORULE"
    CODE_REPRESENTATION_WRULE = "SQLWRULE"
    ALPACA_SFT_WRULE = "INSTRUCTIONWRULE"
    TEXT_REPRESENTATION_WRULE = "TEXTWRULE"
    CODE_REPRESENTATION_COT = "SQLCOT"
    TEXT_REPRESENTATION_COT = "TEXTCOT"
    OPENAI_DEMOSTRATION_COT = "NUMBERSIGNCOT"
    ALPACA_SFT_COT = "INSTRUCTIONCOT"
    CBR = "CBR"


class EXAMPLE_TYPE:
    ONLY_SQL = "ONLYSQL"
    QA = "QA"
    COMPLETE = "COMPLETE"
    QAWRULE = "QAWRULE"
    OPENAI_DEMOSTRATION_QA = "NUMBERSIGNQA"
    BASIC_QA = "BASELINEQA"


_RULE = "Complete Spark SQL query only and with no explanation."
_COT = "Let's think step by step."

# name -> (base, with_fk, with_rule, cot); WORULE = number-sign base minus
# its built-in rule line; CBR = code base + case-based framing
_DECOMPOSE: dict[str, tuple[str, bool, bool, bool]] = {
    REPR_TYPE.CODE_REPRESENTATION: ("sql", False, False, False),
    REPR_TYPE.TEXT_REPRESENTATION: ("text", False, False, False),
    REPR_TYPE.OPENAI_DEMOSTRATION: ("numbersign", False, True, False),
    REPR_TYPE.BASIC: ("baseline", False, False, False),
    REPR_TYPE.ALPACA_SFT: ("instruction", False, False, False),
    REPR_TYPE.OPENAI_DEMOSTRATION_WFK: ("numbersign", True, True, False),
    REPR_TYPE.BASIC_WOFK: ("baseline", False, False, False),
    REPR_TYPE.TEXT_REPRESENTATION_WFK: ("text", True, False, False),
    REPR_TYPE.ALPACA_SFT_WFK: ("instruction", True, False, False),
    REPR_TYPE.OPENAI_DEMOSTRATION_WORULE: ("numbersign", False, False, False),
    REPR_TYPE.CODE_REPRESENTATION_WRULE: ("sql", False, True, False),
    REPR_TYPE.ALPACA_SFT_WRULE: ("instruction", False, True, False),
    REPR_TYPE.TEXT_REPRESENTATION_WRULE: ("text", False, True, False),
    REPR_TYPE.CODE_REPRESENTATION_COT: ("sql", False, False, True),
    REPR_TYPE.TEXT_REPRESENTATION_COT: ("text", False, False, True),
    REPR_TYPE.OPENAI_DEMOSTRATION_COT: ("numbersign", False, True, True),
    REPR_TYPE.ALPACA_SFT_COT: ("instruction", False, False, True),
    REPR_TYPE.CBR: ("sql", False, False, False),
}

ALL_REPR_TYPES: tuple[str, ...] = tuple(_DECOMPOSE)
ALL_EXAMPLE_TYPES: tuple[str, ...] = (
    EXAMPLE_TYPE.ONLY_SQL,
    EXAMPLE_TYPE.QA,
    EXAMPLE_TYPE.COMPLETE,
    EXAMPLE_TYPE.QAWRULE,
    EXAMPLE_TYPE.OPENAI_DEMOSTRATION_QA,
    EXAMPLE_TYPE.BASIC_QA,
)


def _schema_block(base: str, tables: list[tuple[str, list[str]]]) -> str:
    if base in ("sql", "baseline", "instruction"):
        return "\n\n".join(
            f"CREATE TABLE {name} ({', '.join(cols)});" for name, cols in tables
        )
    if base == "text":
        return "\n".join(f"{name}: {', '.join(cols)}" for name, cols in tables)
    # numbersign
    return "\n".join(f"# {name}({', '.join(cols)})" for name, cols in tables)


def _fk_block(base: str, foreign_keys: list[tuple[str, str, str, str]]) -> str:
    lines = [f"{t}.{c} = {rt}.{rc}" for t, c, rt, rc in foreign_keys]
    if not lines:
        return ""
    if base == "numbersign":
        return "### Foreign keys:\n" + "\n".join(f"# {l}" for l in lines)
    return "Foreign keys:\n" + "\n".join(lines)


class DAILPrompt:
    """One question representation, resolved from its REPR_TYPE name."""

    def __init__(self, repr_type: str):
        if repr_type not in _DECOMPOSE:
            raise ValueError(f"{repr_type} is not supported yet")
        self.repr_type = repr_type
        self.base, self.with_fk, self.with_rule, self.cot = _DECOMPOSE[repr_type]

    def format_question(self, example: dict) -> str:
        tables = example.get("tables") or []
        schema = _schema_block(self.base, tables)
        question = example.get("question", "")
        parts: list[str]
        if self.base == "sql":
            parts = [f"/* Given the following database schema: */\n{schema}"]
            if self.repr_type == REPR_TYPE.CBR:
                parts.append("/* Solve by analogy with the cases above. */")
            if self.with_rule:
                parts.append(f"/* {_RULE} */")
            if self.cot:
                # SQLCOTPrompt folds the CoT cue INTO the question line
                # (template_question, DAILSQLGenerate.py:1144)
                parts.append(f"/* {_COT} Answer the following: {question} */")
            else:
                parts.append(f"/* Answer the following: {question} */")
            sep = "\n\n"
        elif self.base == "text":
            parts = [f"Given the following database schema:\n{schema}"]
            if self.with_rule:
                parts.append(_RULE)
            parts.append(f"Answer the following: {question}")
            sep = "\n"
        elif self.base == "numbersign":
            head = f"### {_RULE}\n" if self.with_rule else ""
            parts = [f"{head}### Spark SQL tables, with their properties:\n#\n{schema}\n#"]
            parts.append(f"### {question}")
            sep = "\n"
        elif self.base == "baseline":
            parts = [f"/* Given the following database schema: */\n{schema}"]
            parts.append(f"/* Answer the following: {question} */")
            sep = "\n\n"
        else:  # instruction
            parts = [
                "Below is an instruction that describes a task, paired with a "
                "database schema. Write a Spark SQL response that answers the "
                "question.",
                f"### Schema:\n{schema}",
            ]
            if self.with_rule:
                parts.append(f"### Rule:\n{_RULE}")
            parts.append(f"### Question:\n{question}")
            sep = "\n\n"
        if self.with_fk:
            fk = _fk_block(self.base, example.get("foreign_keys") or [])
            if fk:
                parts.insert(1, fk)
        if self.cot and self.base != "sql":  # sql folds CoT into the question
            parts.append(_COT)
        return sep.join(parts)

    def format_target(self, example: dict) -> str:
        if self.cot and self.base == "sql":
            # SQLCOTPrompt.format_target: the CoT question IS the target —
            # no 'SELECT ' completion stub (the model reasons first)
            return self.format_question(example)
        suffix = "\nA: SELECT " if self.base == "baseline" else "\nSELECT "
        return self.format_question(example) + suffix


def format_example(example: dict, example_format: str, prompt: Optional[DAILPrompt] = None) -> str:
    """Render one few-shot example in the named EXAMPLE_TYPE shape
    (reference example-style classes, DAILSQLGenerate.py:1255-1305)."""
    sql = example.get("sql") or example.get("query") or ""
    q = example.get("question", "")
    if example_format == EXAMPLE_TYPE.ONLY_SQL:
        return sql
    if example_format == EXAMPLE_TYPE.QA:
        return f"Q: {q}\nA: {sql}"
    if example_format == EXAMPLE_TYPE.QAWRULE:
        return f"Q: {_RULE} {q}\nA: {sql}"
    if example_format == EXAMPLE_TYPE.OPENAI_DEMOSTRATION_QA:
        return f"### {q}\n{sql}"
    if example_format == EXAMPLE_TYPE.BASIC_QA:
        return f"/* Answer the following: {q} */\nA: {sql}"
    if example_format == EXAMPLE_TYPE.COMPLETE:
        rendered = (prompt or DAILPrompt(REPR_TYPE.CODE_REPRESENTATION)).format_question(
            example
        )
        return f"{rendered}\n{sql}"
    raise ValueError(f"{example_format} is not supported yet")


class ICLPrompt:
    """k-shot in-context prompt: examples in the chosen style, then the
    target question in the chosen representation (BasicICLPrompt shape,
    DAILSQLGenerate.py:1306+ / prompt_factory :1741+)."""

    def __init__(self, repr_type: str, k_shot: int = 0,
                 example_format: str = EXAMPLE_TYPE.QA):
        self.prompt = DAILPrompt(repr_type)
        self.k_shot = k_shot
        self.example_format = example_format

    # every reference example style shares this prefix line
    # (get_example_prefix, DAILSQLGenerate.py:1256-1303)
    EXAMPLE_PREFIX = "/* Some SQL examples are provided based on similar problems: */\n"

    def format(self, target: dict, examples: list[dict]) -> str:
        blocks = [
            format_example(ex, self.example_format, self.prompt)
            for ex in examples[: self.k_shot]
        ]
        rendered_target = self.prompt.format_target(target)
        if blocks:
            return (
                self.EXAMPLE_PREFIX
                + "\n\n".join(blocks)
                + "\n\n"
                + rendered_target
            )
        return rendered_target


def prompt_factory(repr_type: str, k_shot: int, example_format: str) -> ICLPrompt:
    return ICLPrompt(repr_type, k_shot, example_format)
