"""Column arithmetic expression DSL (reference P4).

The reference parses a string AST supporting ``* / // + -`` and unary
minus over dataset columns, e.g. ``"DATA / (DIR1_DATA + DIR2_DATA)"``
(daskms/expressions.py:6-13 op table, :57-109 ``data_column_expr``).

Here the same surface parses through Python's ``ast`` module and lowers
to Spark ``Column`` expressions — entirely JVM-side, inside whole-stage
codegen.  Tensor (array) columns get elementwise semantics via
higher-order functions (``transform``/``zip_with``), matching the
reference's numpy broadcasting over chunked arrays.
"""

from __future__ import annotations

import ast
import operator
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

__all__ = ["data_column_expr", "apply_expr"]

def _pymod(a, b):
    """Python/numpy ``%`` (result takes the DIVISOR's sign) — the
    semantics the reference gets from numpy.  Spark's native ``%``
    follows C (dividend's sign), so ``-7 % 3`` would differ (review
    r9); the double-mod spelling matches numpy for every sign
    combination."""
    return ((a % b) + b) % b


_BINOPS = {
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mod: _pymod,
}

# Spark has no '//' Column operator; lower to floor(a / b).
_FLOORDIV = object()


class _Lowering(ast.NodeVisitor):
    """Lower the reference's expression AST to a Spark Column tree.

    Scalar-vs-array handling: a binop where either side is an array
    column becomes ``zip_with`` (array ⊗ array) or ``transform``
    (array ⊗ scalar), the codegen'd equivalents of numpy broadcasting.
    """

    def __init__(self, df: DataFrame):
        self.df = df
        self.array_cols = {f.name for f in df.schema.fields
                           if isinstance(f.dataType, ArrayType)}

    def lower(self, node: ast.AST) -> tuple[Column, bool]:
        """Returns (column, is_array)."""
        if isinstance(node, ast.Expression):
            return self.lower(node.body)
        if isinstance(node, ast.Name):
            if node.id not in self.df.columns:
                raise ValueError(f"unknown column {node.id!r}")
            return F.col(node.id), node.id in self.array_cols
        if isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError(f"unsupported literal {node.value!r}")
            return F.lit(node.value), False
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            col, is_arr = self.lower(node.operand)
            if is_arr:
                return F.transform(col, lambda x: -x), True
            return -col, False
        if isinstance(node, ast.BinOp):
            op = (_FLOORDIV if isinstance(node.op, ast.FloorDiv)
                  else _BINOPS.get(type(node.op)))
            if op is None:
                raise ValueError(f"unsupported operator {node.op!r}")
            left, larr = self.lower(node.left)
            right, rarr = self.lower(node.right)

            def scalar_op(a: Column, b: Column) -> Column:
                if op is _FLOORDIV:
                    return F.floor(a / b)
                return op(a, b)

            if larr and rarr:
                return F.zip_with(left, right, scalar_op), True
            if larr:
                return F.transform(left, lambda x: scalar_op(x, right)), True
            if rarr:
                return F.transform(right, lambda y: scalar_op(left, y)), True
            return scalar_op(left, right), False
        raise ValueError(f"unsupported syntax {ast.dump(node)}")


def data_column_expr(df: DataFrame, expression: str) -> Column:
    """Parse ``expression`` over ``df``'s columns into a Spark Column
    (reference ``data_column_expr``, daskms/expressions.py:57-109)."""
    tree = ast.parse(expression, mode="eval")
    col, _ = _Lowering(df).lower(tree)
    return col


def apply_expr(df: DataFrame, **named_exprs: str) -> DataFrame:
    """Assign named expression results: the reference's
    ``ds.assign(X=data_column_expr(...))`` idiom (README.rst:63-66)."""
    for name, expression in named_exprs.items():
        df = df.withColumn(name, data_column_expr(df, expression))
    return df
