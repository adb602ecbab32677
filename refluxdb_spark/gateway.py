"""SQL query gateway: validation + routing, replacing GlueSQL.

The reference gateway is three layers (SURVEY §2.1 O11-O13):

1. a *substring* mutation blocklist (``persistence.rs:147-153``) — so
   naive it rejects any query mentioning ``created_at`` (quirk Q3);
2. a parse check that the first statement is a plain SELECT and the
   extraction of ``from[0].relation`` as the series name
   (``utils/db.rs:110-132``) — it ignores joins and later statements
   (quirks Q8/Q9);
3. execution of the FULL ORIGINAL TEXT against that series' GlueSQL
   database (``persistence.rs:198-201``).

Ours is two layers — token rules plus an AST-grade check through
Catalyst's own parser (``ast_validate``; no third-party SQL-AST
dependency is available in this environment, but Spark's parser is the
one authority on what the text will execute as). The token layer: statements are split outside string literals, exactly one
is allowed, it must start with SELECT (CTE ``WITH … SELECT`` allowed),
mutation keywords are matched as whole tokens — so ``created_at`` is NOT
rejected (documented Q3 divergence; a ``strict_compat`` flag restores
the reference behavior), and EVERY table reference (FROM + JOINs — Q8
fix) is extracted and must be a known series.

Execution routes through per-series temp views over the single
partitioned ``measurements`` table, so ``SELECT * FROM <series>`` works
verbatim while Catalyst prunes to the one series partition — the scan
the per-series sled databases gave the reference, without per-series
storage.
"""

from __future__ import annotations

import re

from refluxdb_spark.errors import ValidationError

# Mutation statements blocked through the query API (persistence.rs:147-153).
_BLOCKED = {"insert", "delete", "update", "drop", "create", "alter", "truncate", "merge"}

# Tokens after which the next identifier is a table reference. Covers
# FROM x [, y], JOIN variants. (Q8 fix: the reference only reads from[0].)
_TABLE_INTRO = {"from", "join"}

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")


def _strip_strings_and_comments(q: str) -> str:
    """Blank out string literals and comments so tokenization can't be
    confused by keywords inside quotes (the reference blocklist has the
    inverse bug — it matches inside identifiers, Q3)."""
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        ch = q[i]
        if ch == "'":
            out.append("'")
            i += 1
            while i < n:
                if q[i] == "'" and i + 1 < n and q[i + 1] == "'":
                    out.append("  ")
                    i += 2
                elif q[i] == "'":
                    out.append("'")
                    i += 1
                    break
                else:
                    out.append(" ")
                    i += 1
        elif ch == '"':
            # double-quoted identifier: keep contents (it's a name)
            j = q.find('"', i + 1)
            j = n if j == -1 else j
            out.append(q[i : j + 1])
            i = j + 1
        elif q.startswith("--", i):
            j = q.find("\n", i)
            j = n if j == -1 else j
            out.append(" " * (j - i))
            i = j
        elif q.startswith("/*", i):
            j = q.find("*/", i + 2)
            j = n - 2 if j == -1 else j
            out.append(" " * (j + 2 - i))
            i = j + 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def validate_query(query: str, strict_compat: bool = False) -> list[str]:
    """Validate a gateway query; return the list of referenced tables.

    Raises ValidationError on: empty input, multi-statement input (Q9
    fix — the reference validates only the first statement but executes
    the whole text), non-SELECT statements, mutation keywords, or no
    table reference.

    With ``strict_compat=True`` the reference's substring blocklist is
    reproduced verbatim (``persistence.rs:148``: uppercase + contains),
    including the Q3 misfeature of rejecting ``created_at``.

    Deliberate conservative REJECTS of valid-to-Spark SQL (documented,
    fuzz-pinned in ``tests/test_gateway.py``): a mutation keyword used
    as a quoted/backticked IDENTIFIER (``SELECT * FROM "drop"``) is
    still rejected — a token validator cannot prove it is a name, and
    no series is ever legitimately called ``drop``; multi-statement
    input is always rejected even when each piece is a SELECT.
    """
    if not query or not query.strip():
        raise ValidationError("empty query")

    if strict_compat:
        up = query.upper()
        for kw in ("INSERT", "DELETE", "UPDATE", "DROP", "CREATE"):
            if kw in up:
                raise ValidationError(f"query contains blocked keyword {kw}")

    clean = _strip_strings_and_comments(query)
    # EXTRACT(x FROM y) / SUBSTRING(x FROM n) / TRIM(... FROM x) /
    # POSITION(a IN b) use FROM/IN inside an argument list — blank those
    # bodies so table extraction doesn't mistake a column for a table.
    clean = re.sub(
        r"(?i)\b(extract|substring|trim|position|overlay)\s*\(([^()]*)\)",
        lambda m: m.group(1) + "(" + " " * len(m.group(2)) + ")",
        clean,
    )

    statements = [s for s in clean.split(";") if s.strip()]
    if len(statements) > 1:
        raise ValidationError("multi-statement input is not allowed")

    tokens = [t.lower() for t in _IDENT.findall(statements[0])]
    if not tokens:
        raise ValidationError("no SQL statement found")
    if tokens[0] not in ("select", "with"):
        raise ValidationError("only SELECT queries are allowed")
    blocked = _BLOCKED.intersection(tokens)
    if blocked:
        raise ValidationError(f"blocked statement keyword(s): {sorted(blocked)}")

    # CTE names are not physical tables; collect them to exclude.
    cte_names = set()
    for m in re.finditer(r"(?i)(?:\bwith\b|,)\s*([A-Za-z_][A-Za-z0-9_]*)\s+as\s*\(", clean):
        cte_names.add(m.group(1).lower())

    tables: list[str] = []
    idents = list(_IDENT.finditer(statements[0]))
    for k, m in enumerate(idents):
        if m.group(0).lower() in _TABLE_INTRO and k + 1 < len(idents):
            j = k + 1
            # JOIN LATERAL (SELECT …) x — LATERAL is a modifier, not a
            # table; look through it at whatever follows
            if idents[j].group(0).lower() == "lateral":
                j += 1
                if j >= len(idents):
                    continue
            nxt = idents[j].group(0)
            # skip subquery openers: "FROM (" has no ident right after
            between = statements[0][m.end() : idents[j].start()]
            if "(" in between:
                continue
            if nxt.lower() not in cte_names:
                tables.append(nxt)
    if not tables:
        raise ValidationError("no table reference found")
    return tables


def ast_validate(spark, query: str) -> str | None:
    """AST-grade statement-type check using Spark's OWN SQL parser —
    the one authority on what the text will execute as (closing the
    token validator's residual dialect-corner risk; the reference's
    analogue is the gluesql sqlparser check at ``utils/db.rs:110-132``).

    The parsed plan is rejected when it is a Catalyst ``Command`` or a
    ``ParsedStatement`` — empirically this covers every mutation, DDL,
    and utility form (INSERT/DELETE/UPDATE/MERGE/CREATE/DROP/ALTER/
    TRUNCATE/EXPLAIN/SET/CACHE/DESCRIBE/SHOW ...), while every pure
    query (SELECT, WITH, set ops, VALUES, TABLE) parses to an ordinary
    logical plan. Unparseable text (including multi-statement input)
    raises. Returns the plan's class simple name on success, or None
    when the parser is unreachable (callers then rely on the token
    verdict alone — the layers are defense-in-depth, both always run
    when available).
    """
    try:
        jparser = spark._jsparkSession.sessionState().sqlParser()
        jcls = spark._jvm.java.lang.Class
        cmd = jcls.forName("org.apache.spark.sql.catalyst.plans.logical.Command")
        stmt = jcls.forName(
            "org.apache.spark.sql.catalyst.plans.logical.ParsedStatement"
        )
    except Exception:
        return None  # parser handle unavailable; token layer still ran
    try:
        plan = jparser.parsePlan(query)
    except Exception as exc:
        first = str(exc).splitlines()[0] if str(exc) else "syntax error"
        raise ValidationError(f"SQL parse error: {first[:200]}")
    name = plan.getClass().getSimpleName()
    if cmd.isInstance(plan) or stmt.isInstance(plan):
        raise ValidationError(
            f"only SELECT queries are allowed (statement parses as {name})"
        )
    return name
