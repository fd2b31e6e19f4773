"""JMESPath-subset compiler: json_path record extraction as native Spark.

The reference extracts inner records with ``jmespath.search(json_path,
payload)`` (classifier/parsers.py:429-448). The shipped schemas only ever
use dotted identifiers and ``[*]`` list projections, but the jmespath
grammar a config COULD carry is wider; this module compiles the useful
subset to Column expressions so the whole extraction stays JVM-side
(get_json_object / from_json / explode — no Python re-parse per record):

- dotted identifiers            ``a.b.c``
- list projection               ``a[*].b``
- index (negative ok)           ``a[0]``, ``a[-1]``
- slice projection (no step)    ``a[1:3]``, ``a[:2]``, ``a[-2:]``
- filter projection             ``a[?level == 'error']``, ``[?n > 3]``,
  with ``&&`` conjunctions; operators == != < <= > >= over string,
  numeric, boolean and null literals (ordering operators require numeric
  literals — jmespath yields null, i.e. drop, for non-number ordering).
  Comparisons are TYPE-STRICT like real jmespath: "3" never equals 3,
  booleans only equal boolean literals, equality against a mismatched
  or missing field is false (so != is true), via the variant reader's
  schema_of_variant — no silent text coercion.

Unsupported (parse_path raises ValueError, so a config using them fails
loudly at plan build, never silently mis-extracts): functions, pipes,
multiselect hashes/lists, flatten ``[]``, ``||``, raw-string literals.

Projection semantics match jmespath where it matters for record
extraction: a projection (``[*]``, slice, filter) yields one OUTPUT ROW
per matching element (the caller's downstream schema parse sees each
element as a candidate record); an empty/missing array yields no rows —
exactly ``_json_path_records``'s "no result -> []". An index out of
range yields null (record turns invalid downstream).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IDENT_RE = re.compile(r"[A-Za-z0-9_]+")
_CMP_RE = re.compile(
    r"^\s*(?P<field>[A-Za-z0-9_][A-Za-z0-9_.]*)\s*"
    r"(?P<op>==|!=|<=|>=|<|>)\s*"
    r"(?P<lit>'[^']*'|-?\d+(?:\.\d+)?|true|false|null)\s*$"
)


def parse_path(path: str) -> list[tuple]:
    """Tokenize a json_path into segments; ValueError on unsupported."""
    segs: list[tuple] = []
    i, n = 0, len(path)
    while i < n:
        ch = path[i]
        if ch == ".":
            i += 1
            continue
        if ch == "[":
            # scan for the closing bracket OUTSIDE single-quoted literals
            # (a filter like [?m == 'a]b'] carries ']' in its literal)
            j, in_quote = i + 1, False
            while j < n and (in_quote or path[j] != "]"):
                if path[j] == "'":
                    in_quote = not in_quote
                j += 1
            if j >= n:
                raise ValueError(f"unclosed bracket in json_path: {path!r}")
            body = path[i + 1:j].strip()
            if body == "*":
                segs.append(("star",))
            elif body == "":
                raise ValueError(f"flatten [] unsupported in json_path: {path!r}")
            elif body.startswith("?"):
                segs.append(("filter", _parse_filter(body[1:], path)))
            elif ":" in body:
                lo_s, hi_s = body.split(":", 1)
                if ":" in hi_s:
                    raise ValueError(f"slice step unsupported: {path!r}")
                segs.append(("slice",
                             int(lo_s) if lo_s.strip() else None,
                             int(hi_s) if hi_s.strip() else None))
            else:
                segs.append(("index", int(body)))
            i = j + 1
            continue
        m = _IDENT_RE.match(path, i)
        if not m:
            raise ValueError(f"unsupported json_path syntax at {i}: {path!r}")
        segs.append(("field", m.group(0)))
        i = m.end()
    if not segs:
        raise ValueError("empty json_path")
    return segs


def _split_conjuncts(expr: str) -> list[str]:
    """Split on ``&&`` OUTSIDE single-quoted literals — ``m == 'a && b'``
    is one comparison whose string literal contains the operator."""
    parts, buf, in_quote, i = [], [], False, 0
    while i < len(expr):
        ch = expr[i]
        if ch == "'":
            in_quote = not in_quote
            buf.append(ch)
        elif not in_quote and expr.startswith("&&", i):
            parts.append("".join(buf))
            buf = []
            i += 2
            continue
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


def _parse_filter(expr: str, path: str) -> list[tuple]:
    """``a == 'x' && b > 3`` -> list of (field, op, kind, value)."""
    comparisons = []
    for part in _split_conjuncts(expr):
        m = _CMP_RE.match(part)
        if not m:
            raise ValueError(f"unsupported filter expression {part!r} in {path!r}")
        field, op, lit = m.group("field"), m.group("op"), m.group("lit")
        if lit.startswith("'"):
            kind, value = "str", lit[1:-1]
        elif lit in ("true", "false"):
            kind, value = "bool", lit
        elif lit == "null":
            kind, value = "null", None
        else:
            kind, value = "num", float(lit)
        if op in ("<", "<=", ">", ">=") and kind != "num":
            # jmespath ordering on non-numbers evaluates to null -> drop;
            # refuse at parse time instead of silently dropping everything
            raise ValueError(
                f"ordering comparison needs a numeric literal: {part!r}")
        comparisons.append((field, op, kind, value))
    return comparisons


def _filter_cond(elem: Column, comparisons: list[tuple]) -> Column:
    """jmespath comparison semantics, TYPE-STRICT like the real engine:
    a quoted numeric string ("n": "3") never equals the numeric literal
    3, a number never equals a string literal, booleans only equal
    boolean literals. The JSON type comes from the variant reader
    (schema_of_variant) — still pure JVM expressions. Equality against
    a mismatched type is false, so ``!=`` is true (including for a
    MISSING field: jmespath null != x -> true); ordering against a
    non-number is null -> the element drops."""
    v = F.try_parse_json(elem)
    cond = F.lit(True)
    for field, op, kind, value in comparisons:
        fv = F.try_variant_get(v, "$." + field, "variant")
        t = F.schema_of_variant(fv)
        val = F.get_json_object(elem, "$." + field)
        if kind == "null":
            # explicit null and missing field both compare equal to null
            c = val.isNull() if op == "==" else val.isNotNull()
        elif kind == "num":
            is_num = (t.isin("BIGINT", "DOUBLE", "FLOAT")
                      | t.startswith("DECIMAL"))
            d = F.try_variant_get(v, "$." + field, "double")
            if op in ("==", "!="):
                eq = F.coalesce(is_num & (d == value), F.lit(False))
                c = eq if op == "==" else ~eq
            else:
                c = is_num & {"<": d < value, "<=": d <= value,
                              ">": d > value, ">=": d >= value}[op]
        elif kind == "bool":
            eq = F.coalesce((t == "BOOLEAN") & (val == value), F.lit(False))
            c = eq if op == "==" else ~eq
        else:  # str
            eq = F.coalesce((t == "STRING") & (val == value), F.lit(False))
            c = eq if op == "==" else ~eq
        cond = cond & F.coalesce(c, F.lit(False))
    return cond


def apply_json_path(
    df: DataFrame, raw_col: str, path: str, tag: str = "jm",
) -> tuple[DataFrame, Column, list[str]]:
    """Compile ``path`` over ``df[raw_col]`` (JSON text). Returns
    (df-with-explodes, result text Column, temp column names to drop).
    Projections multiply rows via explode/posexplode; everything else is
    a pure expression."""
    segs = parse_path(path)
    cur: Column = F.col(raw_col)
    pending: list[str] = []
    temps: list[str] = []
    step = 0

    def flush(c: Column) -> Column:
        if pending:
            c = F.get_json_object(c, "$." + ".".join(pending))
            pending.clear()
        return c

    for seg in segs:
        if seg[0] == "field":
            pending.append(seg[1])
            continue
        cur = flush(cur)
        arr = F.from_json(cur, "array<string>")
        if seg[0] == "star":
            name = f"_sa_{tag}{step}"
            step += 1
            df = df.withColumn(name, F.explode(arr))
            temps.append(name)
            cur = F.col(name)
        elif seg[0] == "index":
            # try_element_at: out-of-range -> null (jmespath: missing),
            # where plain element_at throws under ANSI semantics
            i = seg[1]
            cur = F.try_element_at(arr, F.lit(i + 1 if i >= 0 else i))
        elif seg[0] == "slice":
            lo, hi = seg[1], seg[2]
            arr_name = f"_sa_{tag}a{step}"
            pos_name = f"_sa_{tag}p{step}"
            el_name = f"_sa_{tag}{step}"
            step += 1
            df = df.withColumn(arr_name, arr)
            sz = F.size(F.col(arr_name))
            lo_c = F.lit(0) if lo is None else (
                F.lit(lo) if lo >= 0 else F.greatest(sz + lo, F.lit(0)))
            hi_c = sz if hi is None else (
                F.least(F.lit(hi), sz) if hi >= 0 else sz + hi)
            df = (
                df.select("*",
                          F.posexplode(F.col(arr_name)).alias(pos_name, el_name))
                .filter((F.col(pos_name) >= lo_c) & (F.col(pos_name) < hi_c))
            )
            temps += [arr_name, pos_name, el_name]
            cur = F.col(el_name)
        else:  # filter projection
            name = f"_sa_{tag}{step}"
            step += 1
            df = df.withColumn(name, F.explode(arr))
            df = df.filter(_filter_cond(F.col(name), seg[1]))
            temps.append(name)
            cur = F.col(name)
    return df, flush(cur), temps
