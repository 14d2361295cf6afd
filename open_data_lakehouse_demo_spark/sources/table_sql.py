"""SQL-text DML/maintenance face for the logged table format (r12).

Spark cannot route ``spark.sql("UPDATE ...")`` to a Python-defined data
source (DSv2 DML hooks are JVM-only), so the reference-shaped SQL verbs
get a thin TEXT face instead: one parser mapping each statement onto the
table_log API — the exact pattern Delta used pre-3.0 for ``VACUUM``/
``OPTIMIZE`` text commands. The Python API is the full surface; this
face covers the five operational verbs an admin runbook actually types.

Grammar (deliberately small, fail-loud):

    UPDATE '<path>' SET col = <expr>[, col = <expr> ...] WHERE <pred>
    DELETE FROM '<path>' WHERE <pred>
    MERGE INTO '<path>' USING <source> ON (key[, key ...])
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    OPTIMIZE '<path>' [TARGET <bytes>]
    OPTIMIZE '<path>' ZORDER BY (col[, col ...])
    VACUUM '<path>' [KEEP <n>]

``<source>`` is another quoted logged-table path or a parenthesized
SELECT (run as Spark SQL, so temp views work). The WHEN pair is
REQUIRED verbatim (Delta's SET * / INSERT * shorthand): it spells out
the exact upsert ``tl.merge`` implements — matched rows replaced by
the source row, unmatched source rows inserted, CDC sidecar recorded.
Conditional clauses, column-level SET lists, and WHEN MATCHED DELETE
are not in the grammar; they fail loudly at the Python API pointer.

``<pred>`` is an AND-conjunction of ``col <op> literal`` terms
(ops ``= < <= > >=``; literals: numbers or single-quoted strings) —
exactly the stats-prunable predicate form ``tl.update_where`` /
``tl.delete_rows`` plan file skipping from. SET expressions pass
through verbatim to Spark SQL (any row-level expression). Paths are
single-quoted or backtick-quoted. Anything outside the grammar raises
with a pointer at the Python API rather than guessing.

Reference tie: the reference issues its DML as GoogleSQL text to
BigQuery (SURVEY §3 E2); this face is the equivalent "type SQL at the
table" entry point over the logged format.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from open_data_lakehouse_demo_spark.sources import table_log as tl

_OPS = ("<=", ">=", "=", "<", ">")


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote top level only (a SET expression
    may contain commas inside function calls, string literals, or
    backtick-quoted identifiers)."""
    out, buf, depth, q = [], [], 0, None
    i = 0
    while i < len(s):
        c = s[i]
        if q:
            buf.append(c)
            if c == q:
                # '' inside a string is an escaped quote, stay in-string
                if q == "'" and i + 1 < len(s) and s[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    q = None
        elif c in "'\"`":
            q = c
            buf.append(c)
        elif c in "([":
            depth += 1
            buf.append(c)
        elif c in ")]":
            depth -= 1
            buf.append(c)
        elif c == sep and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    out.append("".join(buf))
    return [p.strip() for p in out if p.strip()]


def _split_top_keyword(s: str, kw: str) -> list[str]:
    """Split ``s`` on word-boundary occurrences of keyword ``kw``
    (case-insensitive) that sit OUTSIDE quotes and parens — 'WHERE' or
    'AND' inside a string literal is data, not grammar (r12 review: the
    regex split used to bind the WHERE inside SET tag = 'a WHERE b')."""
    parts, buf, depth, q = [], [], 0, None
    i, n, k = 0, len(s), len(kw)
    while i < n:
        c = s[i]
        if q:
            buf.append(c)
            if c == q:
                if q == "'" and i + 1 < n and s[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    q = None
        elif c in "'\"`":
            q = c
            buf.append(c)
        elif c in "([":
            depth += 1
            buf.append(c)
        elif c in ")]":
            depth -= 1
            buf.append(c)
        elif (depth == 0 and s[i:i + k].upper() == kw
              and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
              and (i + k >= n or not (s[i + k].isalnum() or s[i + k] == "_"))):
            parts.append("".join(buf))
            buf = []
            i += k
            continue
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts]


def _literal(tok: str):
    tok = tok.strip()
    if re.fullmatch(r"'(?:[^']|'')*'", tok):
        return tok[1:-1].replace("''", "'")
    if re.fullmatch(r"[+-]?\d+", tok):
        return int(tok)
    if re.fullmatch(r"[+-]?(?:\d+\.\d*|\.\d+|\d+(?:\.\d*)?[eE][+-]?\d+)", tok):
        return float(tok)
    raise ValueError(
        f"unsupported literal {tok!r}: the text face takes numbers and "
        "single-quoted strings (use the Python API for anything richer)"
    )


def _parse_predicate(s: str) -> list[tuple]:
    """AND-conjunction of ``col op literal`` → table_log where-tuples."""
    if len(_split_top_keyword(s, "OR")) > 1:
        raise ValueError(
            "unsupported predicate: OR-disjunctions are not stats-prunable "
            "as where-tuples — use tl.delete_where (SQL-string predicate, "
            "full-rewrite semantics) or split into per-branch statements"
        )
    terms = _split_top_keyword(s.strip(), "AND")
    out = []
    for t in terms:
        m = re.fullmatch(
            r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(<=|>=|=|<|>)\s*(.+?)\s*", t
        )
        if not m:
            raise ValueError(
                f"unsupported predicate term {t!r}: the text face takes "
                "AND-conjunctions of `col <op> literal` (ops = < <= > >=) "
                "— the stats-prunable form; use tl.update_where / "
                "tl.delete_rows directly for richer predicates"
            )
        out.append((m.group(1), m.group(2), _literal(m.group(3))))
    return out


def _path_of(tok: str) -> str:
    m = re.fullmatch(r"\s*(?:'([^']+)'|`([^`]+)`)\s*", tok)
    if not m:
        raise ValueError(
            f"table path must be quoted ('/p/t' or `/p/t`), got {tok!r}"
        )
    return m.group(1) or m.group(2)


def table_dml(spark: SparkSession, stmt: str) -> int:
    """Execute one DML/maintenance statement against a logged table;
    returns the resulting snapshot id (unchanged id = provable no-op).
    See the module docstring for the grammar."""
    s = stmt.strip().rstrip(";").strip()
    m = re.match(
        r"(?is)^UPDATE\s+('[^']*'|`[^`]*`|\S+)\s+SET\s+(.*)$", s
    )
    if m:
        path = _path_of(m.group(1))
        # quote-aware WHERE split: 'WHERE' inside a SET string literal
        # is data (r12 review)
        halves = _split_top_keyword(m.group(2), "WHERE")
        if len(halves) != 2:
            raise ValueError(
                "UPDATE needs exactly one top-level WHERE clause "
                f"(got {len(halves) - 1} in {stmt!r})"
            )
        sets = {}
        for a in _split_top(halves[0]):
            am = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$", a, re.S)
            if not am:
                raise ValueError(f"unsupported SET assignment {a!r}")
            sets[am.group(1)] = am.group(2).strip()
        return tl.update_where(spark, path, _parse_predicate(halves[1]), sets)
    m = re.match(
        r"(?is)^DELETE\s+FROM\s+('[^']*'|`[^`]*`|\S+)\s+(.*)$", s
    )
    if m:
        halves = _split_top_keyword(m.group(2), "WHERE")
        if len(halves) != 2 or halves[0]:
            raise ValueError(
                f"DELETE FROM needs exactly one WHERE clause, got {stmt!r}"
            )
        return tl.delete_rows(
            spark, _path_of(m.group(1)), _parse_predicate(halves[1])
        )
    m = re.match(
        r"(?is)^MERGE\s+INTO\s+('[^']*'|`[^`]*`|\S+)\s+USING\s+(.*)$", s
    )
    if m:
        path = _path_of(m.group(1))
        on_parts = _split_top_keyword(m.group(2), "ON")
        if len(on_parts) != 2:
            raise ValueError(
                "MERGE INTO needs exactly one top-level ON clause "
                f"(got {len(on_parts) - 1} in {stmt!r}); a subquery "
                "source's own ONs must sit inside its parentheses"
            )
        src_tok, tail = on_parts
        when_parts = _split_top_keyword(tail, "WHEN")
        keys_m = re.fullmatch(r"\s*\(([^()]*)\)\s*", when_parts[0])
        keys = ([c.strip() for c in keys_m.group(1).split(",") if c.strip()]
                if keys_m else [])
        if not keys_m or not keys:
            raise ValueError(
                f"MERGE INTO ON takes a parenthesized key-column list — "
                f"ON (id) or ON (id, region) — got {when_parts[0]!r}; "
                "arbitrary join conditions are the Python API (tl.merge)"
            )
        clauses = [re.sub(r"\s+", " ", c).strip().upper()
                   for c in when_parts[1:]]
        if clauses != ["MATCHED THEN UPDATE SET *",
                       "NOT MATCHED THEN INSERT *"]:
            raise ValueError(
                "MERGE INTO requires exactly 'WHEN MATCHED THEN UPDATE "
                "SET * WHEN NOT MATCHED THEN INSERT *' — the upsert "
                "tl.merge implements; conditional clauses, column-level "
                "SET lists, and WHEN MATCHED DELETE are the Python API "
                f"(got {when_parts[1:]!r})"
            )
        src_tok = src_tok.strip()
        if re.fullmatch(r"'[^']*'|`[^`]*`", src_tok):
            source = tl.read(spark, _path_of(src_tok))
        elif re.fullmatch(r"(?s)\(.*\)", src_tok):
            source = spark.sql(src_tok[1:-1])
        else:
            raise ValueError(
                f"MERGE INTO USING takes a quoted logged-table path or a "
                f"parenthesized SELECT, got {src_tok!r}"
            )
        return tl.merge(spark, path, source, on=keys)
    m = re.match(
        r"(?is)^OPTIMIZE\s+('[^']*'|`[^`]*`)\s+ZORDER\s+BY\s*\(([^)]*)\)\s*$",
        s,
    )
    if m:
        cols = [c.strip() for c in m.group(2).split(",") if c.strip()]
        if not cols:
            raise ValueError("ZORDER BY needs at least one column")
        return tl.optimize_zorder(spark, _path_of(m.group(1)), cols)
    m = re.match(
        r"(?is)^OPTIMIZE\s+('[^']*'|`[^`]*`)(?:\s+TARGET\s+(\d+))?\s*$", s
    )
    if m:
        kwargs = {}
        if m.group(2):
            kwargs["target_bytes"] = int(m.group(2))
        return tl.compact_small_files(spark, _path_of(m.group(1)), **kwargs)
    m = re.match(
        r"(?is)^VACUUM\s+('[^']*'|`[^`]*`)(?:\s+KEEP\s+(\d+))?\s*$", s
    )
    if m:
        p = _path_of(m.group(1))
        keep = int(m.group(2)) if m.group(2) else 1
        if keep < 1:
            raise ValueError(
                "VACUUM KEEP must be >= 1: keeping zero snapshots would "
                "delete the whole table (use the Python API's explicit "
                "keep_last=0 if destruction is really intended)"
            )
        tl.vacuum(spark, p, keep_last=keep)
        return tl._list_snapshots(p)[-1]
    raise ValueError(
        f"unsupported statement {stmt!r}: the text face covers "
        "UPDATE/DELETE/MERGE INTO/OPTIMIZE [ZORDER BY|TARGET]/VACUUM "
        "over quoted table paths — everything else is the Python API "
        "(open_data_lakehouse_demo_spark.sources.table_log)"
    )
