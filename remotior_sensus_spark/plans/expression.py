"""band_calc expression DSL -> Spark Column compiler.

Re-expresses the reference's expression engine (tools/band_calc.py:87-274
parse; core/processor_functions.py:112-160 ``band_calculation`` — a
masked-numpy ``eval``) as a driver-side compiler from the same grammar to
a scalar Column function applied per pixel inside JVM higher-order
functions. Nothing here executes per-row Python.

Grammar supported (the fixture-relevant surface of band_calc):
  * quoted band variables: ``"B08"``, ``"bandset1b4"`` — any token in
    double quotes becomes a bound variable
  * arithmetic ``+ - * / **``, unary ``-``, parentheses
  * comparisons ``> < >= <= == !=`` — result is 0/1 (bool->int cast,
    processor_functions.py:156-157)
  * ``where(cond, a, b)`` (np.ma.where)
  * unary math: log log10 sqrt exp sin cos tan arcsin arccos arctan abs
  * ``clip(x, lo, hi)`` (np.clip in fixtures, tests/test_band_calc.py)
  * cross-band reducers over a literal band list with axis=0:
    ``min max sum mean median std percentile([..], p)`` — the percentile
    uses the reference's closest-observation rule with round-half-even
    index (processor_functions.py:86-101), computed at plan time since
    the band count and p are literals
  * ``nan`` literal; numeric literals
  * expression aliases ``#NDVI#`` / ``#EVI#`` (configurations.py:313-326)
    and spectral aliases ``#BLUE#/#GREEN#/#RED#/#NIR#`` resolved by the
    caller's variable map
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# reference: core/configurations.py:313-326 (expression_alias)
EXPRESSION_ALIASES = {
    "#NDVI#": '( "#NIR#" - "#RED#" ) / ( "#NIR#" + "#RED#" )',
    "#EVI#": '2.5 * ( "#NIR#" - "#RED#" ) / ( "#NIR#" + 6 * "#RED#" - 7.5 * "#BLUE#" + 1 )',
}


@dataclass
class CompiledExpression:
    variables: list[str]          # referenced band variables, in first-use order
    fn: object                    # callable(dict[str, Column]) -> Column
    source: str


def expand_aliases(expression: str) -> str:
    for k, v in EXPRESSION_ALIASES.items():
        expression = expression.replace(k, v)
    return expression


_VAR_RE = re.compile(r'"([^"]+)"')


def _num(c, is_bool: bool) -> Column:
    return c.cast("double") if is_bool else c


def _bool(c, is_bool: bool) -> Column:
    return c if is_bool else (c != F.lit(0.0))


def percentile_index(count: int, p: float) -> int:
    """Closest-observation index with numpy round-half-even
    (processor_functions.py:94-96)."""
    return int(np.round((count - 1) * float(p) / 100.0))


class _Compiler(ast.NodeVisitor):
    """ast -> fn(env)->(Column, is_bool)."""

    _BINOPS = {
        ast.Add: lambda a, b: a + b,
        ast.Sub: lambda a, b: a - b,
        ast.Mult: lambda a, b: a * b,
        # try_divide: Spark 4 runs ANSI mode by default, where `/` THROWS
        # on a zero denominator at a valid pixel, aborting the whole job.
        # The reference's masked-numpy eval yields inf/nan instead
        # (processor_functions.py:121-130); we pin null (-> nodata), the
        # documented deviation — a poisoned pixel, never a dead job.
        ast.Div: lambda a, b: F.try_divide(a, b),
        ast.Pow: lambda a, b: F.pow(a, b),
        # pmod = numpy's sign-of-divisor mod for positive divisors (the
        # reference kernel is numpy eval); Spark's `%` is sign-of-dividend
        ast.Mod: lambda a, b: F.pmod(a, b),
    }
    _CMPOPS = {
        ast.Gt: lambda a, b: a > b,
        ast.Lt: lambda a, b: a < b,
        ast.GtE: lambda a, b: a >= b,
        ast.LtE: lambda a, b: a <= b,
        ast.Eq: lambda a, b: a == b,
        ast.NotEq: lambda a, b: a != b,
    }
    _UNARY_FUNCS = {
        "log": F.log, "log10": F.log10, "sqrt": F.sqrt, "exp": F.exp,
        "sin": F.sin, "cos": F.cos, "tan": F.tan, "arcsin": F.asin,
        "arccos": F.acos, "arctan": F.atan, "abs": F.abs,
    }
    _REDUCERS = ("min", "max", "sum", "mean", "median", "std", "percentile")

    def __init__(self) -> None:
        self.variables: list[str] = []

    def compile(self, node):
        return self._expr(node)

    # each _expr returns fn(env) -> (Column, is_bool)
    def _expr(self, node):
        if isinstance(node, ast.Expression):
            return self._expr(node.body)
        if isinstance(node, ast.BinOp):
            op = self._BINOPS.get(type(node.op))
            if op is None:
                raise ValueError(f"unsupported operator {ast.dump(node.op)}")
            lf, rf = self._expr(node.left), self._expr(node.right)
            return lambda env: (op(_num(*lf(env)), _num(*rf(env))), False)
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            vf = self._expr(node.operand)
            return lambda env: (-_num(*vf(env)), False)
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise ValueError("chained comparisons unsupported")
            op = self._CMPOPS[type(node.ops[0])]
            lf, rf = self._expr(node.left), self._expr(node.comparators[0])
            return lambda env: (op(_num(*lf(env)), _num(*rf(env))), True)
        if isinstance(node, ast.BoolOp):
            parts = [self._expr(v) for v in node.values]
            if isinstance(node.op, ast.And):
                def andf(env):
                    c = _bool(*parts[0](env))
                    for p in parts[1:]:
                        c = c & _bool(*p(env))
                    return c, True
                return andf
            def orf(env):
                c = _bool(*parts[0](env))
                for p in parts[1:]:
                    c = c | _bool(*p(env))
                return c, True
            return orf
        if isinstance(node, ast.Constant):
            if node.value is None:
                raise ValueError("None literal unsupported")
            return lambda env: (F.lit(float(node.value)), False)
        if isinstance(node, ast.Name):
            name = node.id
            if name == "nan":
                return lambda env: (F.lit(float("nan")), False)
            if name.startswith("__v_"):
                var = self._varname(name)
                return lambda env: (env[var].cast("double"), False)
            raise ValueError(f"unknown identifier {name}")
        if isinstance(node, ast.Call):
            return self._call(node)
        raise ValueError(f"unsupported syntax {ast.dump(node)[:80]}")

    def _varname(self, mangled: str) -> str:
        idx = int(mangled[4:].rstrip("_"))
        return self.variables[idx]

    def _call(self, node: ast.Call):
        fname = node.func.id if isinstance(node.func, ast.Name) else None
        if fname is None and isinstance(node.func, ast.Attribute):
            fname = node.func.attr  # np.clip / np.where style
        if fname == "where":
            c, a, b = (self._expr(x) for x in node.args)
            return lambda env: (
                F.when(_bool(*c(env)), _num(*a(env))).otherwise(_num(*b(env))),
                False,
            )
        if fname == "clip":
            x, lo, hi = (self._expr(a) for a in node.args)
            return lambda env: (
                F.least(F.greatest(_num(*x(env)), _num(*lo(env))), _num(*hi(env))),
                False,
            )
        if fname in self._UNARY_FUNCS and len(node.args) == 1:
            f = self._UNARY_FUNCS[fname]
            vf = self._expr(node.args[0])
            return lambda env: (f(_num(*vf(env))), False)
        if fname in self._REDUCERS:
            return self._reducer(fname, node)
        raise ValueError(f"unsupported function {fname}")

    def _reducer(self, fname: str, node: ast.Call):
        # first arg must be a literal list of expressions (band stack, axis=0)
        if not node.args or not isinstance(node.args[0], (ast.List, ast.Tuple)):
            raise ValueError(f"{fname} requires a literal band list")
        parts = [self._expr(e) for e in node.args[0].elts]
        n = len(parts)
        if fname == "min":
            return lambda env: (F.least(*[_num(*p(env)) for p in parts]), False)
        if fname == "max":
            return lambda env: (F.greatest(*[_num(*p(env)) for p in parts]), False)
        if fname == "sum":
            def sumf(env):
                c = _num(*parts[0](env))
                for p in parts[1:]:
                    c = c + _num(*p(env))
                return c, False
            return sumf
        if fname == "mean":
            def meanf(env):
                c = _num(*parts[0](env))
                for p in parts[1:]:
                    c = c + _num(*p(env))
                return c / F.lit(float(n)), False
            return meanf
        if fname == "std":
            def stdf(env):
                xs = [_num(*p(env)) for p in parts]
                s = xs[0]
                for x in xs[1:]:
                    s = s + x
                mu = s / F.lit(float(n))
                ss = (xs[0] - mu) * (xs[0] - mu)
                for x in xs[1:]:
                    ss = ss + (x - mu) * (x - mu)
                # np.ma.std default ddof=0
                return F.sqrt(ss / F.lit(float(n))), False
            return stdf
        if fname in ("median", "percentile"):
            p = 50.0
            if fname == "percentile":
                if len(node.args) < 2 or not isinstance(node.args[1], ast.Constant):
                    raise ValueError("percentile requires a literal p")
                p = float(node.args[1].value)
            if fname == "median" and n % 2 == 0:
                # np.ma.median averages the middle two for even counts
                def medf(env):
                    arr = F.array_sort(F.array(*[_num(*q(env)) for q in parts]))
                    lo = F.element_at(arr, n // 2)
                    hi = F.element_at(arr, n // 2 + 1)
                    return (lo + hi) / F.lit(2.0), False
                return medf
            idx = percentile_index(n, p) if fname == "percentile" else (n - 1) // 2
            def percf(env):
                arr = F.array_sort(F.array(*[_num(*q(env)) for q in parts]))
                return F.element_at(arr, idx + 1), False
            return percf
        raise ValueError(fname)


def compile_expression(expression: str) -> CompiledExpression:
    expression = expand_aliases(expression)
    variables: list[str] = []

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in variables:
            variables.append(name)
        return f"__v_{variables.index(name)}__"

    py_src = _VAR_RE.sub(sub, expression)
    tree = ast.parse(py_src, mode="eval")
    comp = _Compiler()
    comp.variables = variables
    inner = comp.compile(tree)

    def fn(env: dict[str, Column]) -> Column:
        col, is_bool = inner(env)
        return _num(col, is_bool)

    return CompiledExpression(variables=variables, fn=fn, source=expression)
