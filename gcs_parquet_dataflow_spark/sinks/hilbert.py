"""Hilbert-curve data layout: the locality upgrade over Morton
(Z-order) keys that VERDICT r9 item 4 documented as the next dial.

Why Hilbert: a Morton key's bit-interleave makes big jumps at power-of-
two boundaries (the curve teleports across the grid between quadrants),
so per-file bounding boxes along the sort order carry dead volume. The
Hilbert curve visits every cell of the 2^bits^n grid moving EXACTLY one
step in one dimension at a time (adjacency is exhaustively test-pinned
per dimension count), so consecutive key ranges are contiguous blobs —
tighter per-file min/max zones, better pruning on every dimension. The
classic trade: Hilbert costs more arithmetic per row at WRITE time
(layout jobs are offline) for strictly better read-side clustering.

Algorithm: Skilling's transpose form (J. Skilling, "Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004 — public domain algorithm):
an in-place sequence of conditional XOR/AND bit steps per coordinate,
then a Gray-code pass, then the bit transpose. The step sequence is
data-DEPENDENT (each step branches on a bit of the evolving state), so
it cannot be one closed-form Column expression; instead the SAME
Python loop emits the SSA assignment list for BOTH engines:

- Spark: a chain of ``withColumn(F.expr(...))`` steps — Catalyst keeps
  chained projections with multiply-referenced non-trivial aliases as
  separate codegen'd projections (CollapseProject's duplication guard),
  so the plan stays linear in the step count, fully JVM-side, no UDF.
- DuckDB (the oracle twin): ONE select with lateral column aliases —
  sequential evaluation, same SSA list, ``xor()`` instead of ``^``
  (DuckDB's ``^`` is exponentiation — the one dialect divergence).

The key is a bijection on the full n-dimensional bit domain (test-
pinned with exact [0, 2^(n·bits)) coverage), so sorting by it is a
total order with no collisions beyond coordinate truncation mod
2^bits — identical truncation semantics to ``zorder_key_n``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Engine-neutral SSA step list (single source for Spark + DuckDB)
# ---------------------------------------------------------------------------


def _hilbert_steps(n: int, bits: int):
    """(steps, final_vars): steps = [(name, expr)] in SSA form over the
    pre-masked inputs ``h_in0..h_in{n-1}``; expr is a tiny tuple AST:
    ("var", name) | ("lit", int) | ("xor", a, b) | ("and", a, b) |
    ("ifbit", var_name, mask, then_expr, else_expr)."""
    steps: list[tuple[str, tuple]] = []
    cur = [f"h_in{i}" for i in range(n)]
    ctr = [0]

    def fresh(tag: str) -> str:
        ctr[0] += 1
        return f"_h{ctr[0]}{tag}"

    def var(nm: str) -> tuple:
        return ("var", nm)

    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            if i == 0:
                nm = fresh("a")
                steps.append((nm, (
                    "ifbit", cur[0], q,
                    ("xor", var(cur[0]), ("lit", p)),
                    var(cur[0]),
                )))
                cur[0] = nm
            else:
                # t = (X0 ^ Xi) & P in the else branch, 0 in the if
                # branch — then X0 ^= (P | t per branch), Xi ^= t
                nm_t = fresh("t")
                steps.append((nm_t, (
                    "ifbit", cur[i], q,
                    ("lit", 0),
                    ("and", ("xor", var(cur[0]), var(cur[i])), ("lit", p)),
                )))
                nm0 = fresh("a")
                steps.append((nm0, (
                    "ifbit", cur[i], q,
                    ("xor", var(cur[0]), ("lit", p)),
                    ("xor", var(cur[0]), var(nm_t)),
                )))
                nmi = fresh("b")
                steps.append((nmi, ("xor", var(cur[i]), var(nm_t))))
                cur[0], cur[i] = nm0, nmi
        q >>= 1
    # Gray-code pass (sequential: X[i] ^= X[i-1] with the UPDATED left)
    for i in range(1, n):
        nm = fresh("g")
        steps.append((nm, ("xor", var(cur[i]), var(cur[i - 1]))))
        cur[i] = nm
    # t accumulation over the last coordinate's bits
    t_name = fresh("s")
    steps.append((t_name, ("lit", 0)))
    q = 1 << (bits - 1)
    while q > 1:
        nm = fresh("s")
        steps.append((nm, (
            "ifbit", cur[n - 1], q,
            ("xor", var(t_name), ("lit", q - 1)),
            var(t_name),
        )))
        t_name = nm
        q >>= 1
    for i in range(n):
        nm = fresh("f")
        steps.append((nm, ("xor", var(cur[i]), var(t_name))))
        cur[i] = nm
    return steps, cur


def _render(e: tuple, dialect: str) -> str:
    kind = e[0]
    if kind == "var":
        return e[1]
    if kind == "lit":
        return str(e[1])
    if kind == "xor":
        a, b = _render(e[1], dialect), _render(e[2], dialect)
        return f"xor({a}, {b})" if dialect == "duckdb" else f"({a} ^ {b})"
    if kind == "and":
        return f"({_render(e[1], dialect)} & {_render(e[2], dialect)})"
    if kind == "ifbit":
        _, v, mask, then_e, else_e = e
        return (
            f"CASE WHEN ({v} & {mask}) != 0 THEN "
            f"{_render(then_e, dialect)} ELSE "
            f"{_render(else_e, dialect)} END"
        )
    raise ValueError(f"unknown node {e!r}")


def _transpose_expr(final_vars: list[str], bits: int) -> str:
    """Bit transpose of the final per-dimension words into the Hilbert
    index (dimension 0 most significant within each bit level) —
    disjoint bit positions, so plain addition; dialect-neutral."""
    n = len(final_vars)
    terms = []
    for b in range(bits):
        for j, v in enumerate(final_vars):
            pos = n * bits - 1 - (b * n + j)
            terms.append(f"((({v} >> {bits - 1 - b}) & 1) << {pos})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def with_hilbert_key(
    df: DataFrame, cols: list[str], bits: int = 8, out: str = "_hkey"
) -> DataFrame:
    """df + ``out`` = the Hilbert index of ``cols`` (each truncated mod
    2^bits, same semantics as zorder_key_n). Pure Column arithmetic via
    chained projections — JVM-side, codegen'd, no UDF; N·bits ≤ 63."""
    n = len(cols)
    if n < 1:
        raise ValueError("at least one column required")
    if n * bits > 63:
        raise ValueError(
            f"{n} columns × {bits} bits = {n * bits} exceeds the 63-bit "
            f"key budget; lower bits to ≤ {63 // n}"
        )
    m = 2**bits
    names = []
    for i, c in enumerate(cols):
        df = df.withColumn(f"h_in{i}", F.col(c).cast("long") % F.lit(m))
        names.append(f"h_in{i}")
    steps, final_vars = _hilbert_steps(n, bits)
    for name, expr in steps:
        df = df.withColumn(name, F.expr(_render(expr, "spark")))
        names.append(name)
    df = df.withColumn(out, F.expr(_transpose_expr(final_vars, bits)))
    return df.drop(*names)


def hilbert_index_py(coords: list[int], bits: int) -> int:
    """Plain-Python reference (same Skilling steps, imperative form) —
    the independent third implementation the exhaustive tests compare
    both engines against."""
    x = [c % (1 << bits) for c in coords]
    n = len(x)
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            if x[i] & q:
                x[0] ^= p
            else:
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q >>= 1
    for i in range(1, n):
        x[i] ^= x[i - 1]
    t = 0
    q = 1 << (bits - 1)
    while q > 1:
        if x[n - 1] & q:
            t ^= q - 1
        q >>= 1
    h = 0
    for b in range(bits):
        for j in range(n):
            bit = ((x[j] ^ t) >> (bits - 1 - b)) & 1
            h |= bit << (n * bits - 1 - (b * n + j))
    return h


# ---------------------------------------------------------------------------
# DuckDB twin
# ---------------------------------------------------------------------------


def hilbert_sql_ctes(
    source: str,
    keep_cols: list[str],
    cols: list[str],
    bits: int = 8,
    out: str = "hkey",
    prefix: str = "hs",
) -> tuple[str, str]:
    """The DuckDB twin as a chain of MATERIALIZED CTEs over ``source``
    (a table/CTE name): returns ``(with_body, final_cte)`` — embed as
    ``WITH {with_body} SELECT … FROM {final_cte}``; the final CTE
    carries ``keep_cols`` + ``out``.

    MATERIALIZED is load-bearing: DuckDB inlines both plain CTEs and
    lateral column aliases by SUBSTITUTION, and the SSA steps reference
    prior steps up to 3 times each — inlining is exponential in the
    step count (measured: a 30-step 3-D key hangs; materialized chain
    runs in milliseconds).  ``xor()`` is DuckDB's bitwise XOR (its
    ``^`` is exponentiation — the one dialect divergence)."""
    n = len(cols)
    m = 2**bits
    keep = ", ".join(keep_cols)
    masked = ", ".join(
        f"(CAST({c} AS BIGINT) % {m}) AS h_in{i}" for i, c in enumerate(cols)
    )
    ctes = [f"{prefix}0 AS MATERIALIZED (SELECT {keep}, {masked} FROM {source})"]
    steps, final_vars = _hilbert_steps(n, bits)
    prev = f"{prefix}0"
    for k, (name, expr) in enumerate(steps, 1):
        ctes.append(
            f"{prefix}{k} AS MATERIALIZED (SELECT *, "
            f"{_render(expr, 'duckdb')} AS {name} FROM {prev})"
        )
        prev = f"{prefix}{k}"
    final = f"{prefix}_out"
    ctes.append(
        f"{final} AS (SELECT {keep}, "
        f"{_transpose_expr(final_vars, bits)} AS {out} FROM {prev})"
    )
    return ",\n    ".join(ctes), final


# ---------------------------------------------------------------------------
# Layout writer
# ---------------------------------------------------------------------------


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Hilbert-clustered layout: range-partition + sort by the Hilbert
    index of ``cols``, then drop the key — same write shape as
    write_zordered, tighter per-file bounding boxes (the adjacency
    property means consecutive key ranges are contiguous regions, not
    quadrant-hopping Morton runs; the improvement is measured in
    tests/test_round10.py against the Morton layout on the same
    grid)."""
    keyed = with_hilbert_key(df, cols, bits, out="_hkey")
    parted = (
        keyed.repartitionByRange(n_files, "_hkey")
        if n_files
        else keyed.repartitionByRange("_hkey")
    )
    parted.sortWithinPartitions("_hkey").drop("_hkey").write.mode(
        mode
    ).parquet(path)
