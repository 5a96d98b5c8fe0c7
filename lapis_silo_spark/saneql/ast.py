"""SaneQL AST (reference: ``saneql/ast.h``): pipe calls, literals, records."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Node:
    line: int = field(default=1, kw_only=True)
    column: int = field(default=1, kw_only=True)

    @property
    def loc(self) -> str:
        return f"{self.line}:{self.column}"


@dataclass
class Identifier(Node):
    name: str


@dataclass
class IntLiteral(Node):
    value: int


@dataclass
class FloatLiteral(Node):
    value: float


@dataclass
class StringLiteral(Node):
    value: str


@dataclass
class BoolLiteral(Node):
    value: bool


@dataclass
class NullLiteral(Node):
    pass


@dataclass
class SetLiteral(Node):
    elements: list[Node]


@dataclass
class RecordField:
    name: str
    value: Node


@dataclass
class RecordLiteral(Node):
    fields: list[RecordField]


@dataclass
class FunctionCall(Node):
    function_name: str
    positional: list[Node]
    named: list[tuple[str, Node]]


@dataclass
class BinaryExpr(Node):
    op: str  # '&&' '||' '=' '!=' '<' '<=' '>' '>='
    left: Node
    right: Node


@dataclass
class UnaryNotExpr(Node):
    operand: Node


@dataclass
class TypeCast(Node):
    operand: Node
    target_type: str


def describe(node: Node) -> str:
    """Short human description for diagnostics."""
    if isinstance(node, Identifier):
        return node.name
    if isinstance(node, StringLiteral):
        return f"'{node.value}'"
    if isinstance(node, (IntLiteral, FloatLiteral, BoolLiteral)):
        return str(node.value)
    if isinstance(node, NullLiteral):
        return "null"
    if isinstance(node, FunctionCall):
        return f"{node.function_name}(...)"
    return type(node).__name__


Expression = Node
OptionalNode = Optional[Node]
