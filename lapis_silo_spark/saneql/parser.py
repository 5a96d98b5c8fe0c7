"""SaneQL recursive-descent parser (reference: ``saneql/parser.cpp``).

Precedence (loosest → tightest): ``||`` → ``&&`` → ``!`` → comparison
(non-associative) → postfix (``.method(...)``, ``.property``, ``::type``) →
primary (parens, ``{set|record}``, unary minus, identifier/call, literal).
"""

from __future__ import annotations

from lapis_silo_spark.saneql import ast
from lapis_silo_spark.saneql.lexer import QueryParseError, T, Token, tokenize


class _Parser:
    def __init__(self, text: str):
        self.tokens = tokenize(text)
        self.pos = 0

    @property
    def cur(self) -> Token:
        return self.tokens[self.pos]

    def advance(self) -> Token:
        tok = self.cur
        if tok.type is not T.EOF:
            self.pos += 1
        return tok

    def check(self, t: T) -> bool:
        return self.cur.type is t

    def match(self, t: T) -> bool:
        if self.check(t):
            self.advance()
            return True
        return False

    def expect(self, t: T) -> Token:
        if not self.check(t):
            raise QueryParseError(
                f"Expected {t.value} but got {self.cur.type.value}",
                self.cur.line,
                self.cur.column,
            )
        return self.advance()

    # -- grammar -----------------------------------------------------------
    def parse(self) -> ast.Node:
        expr = self.parse_expression()
        self.expect(T.EOF)
        return expr

    def parse_expression(self) -> ast.Node:
        return self.parse_or()

    def parse_or(self) -> ast.Node:
        left = self.parse_and()
        while self.check(T.OR):
            tok = self.advance()
            right = self.parse_and()
            left = ast.BinaryExpr("||", left, right, line=tok.line, column=tok.column)
        return left

    def parse_and(self) -> ast.Node:
        left = self.parse_not()
        while self.check(T.AND):
            tok = self.advance()
            right = self.parse_not()
            left = ast.BinaryExpr("&&", left, right, line=tok.line, column=tok.column)
        return left

    def parse_not(self) -> ast.Node:
        if self.check(T.NOT):
            tok = self.advance()
            operand = self.parse_not()
            return ast.UnaryNotExpr(operand, line=tok.line, column=tok.column)
        return self.parse_comparison()

    _CMP = {
        T.EQUALS: "=",
        T.NOT_EQUALS: "!=",
        T.LESS_THAN: "<",
        T.LESS_EQUAL: "<=",
        T.GREATER_THAN: ">",
        T.GREATER_EQUAL: ">=",
    }

    def parse_comparison(self) -> ast.Node:
        left = self.parse_postfix()
        if self.cur.type in self._CMP:
            tok = self.advance()
            right = self.parse_postfix()
            left = ast.BinaryExpr(
                self._CMP[tok.type], left, right, line=tok.line, column=tok.column
            )
        return left

    def parse_postfix(self) -> ast.Node:
        expr = self.parse_primary()
        while True:
            if self.check(T.DOT):
                self.advance()
                name_tok = self.expect(T.IDENT)
                if self.match(T.LPAREN):
                    positional: list[ast.Node] = [expr]
                    named: list[tuple[str, ast.Node]] = []
                    if not self.check(T.RPAREN):
                        pos, named = self.parse_arg_list()
                        positional.extend(pos)
                    self.expect(T.RPAREN)
                    expr = ast.FunctionCall(
                        name_tok.value, positional, named,
                        line=name_tok.line, column=name_tok.column,
                    )
                else:
                    # property access sugar: receiver becomes sole argument
                    expr = ast.FunctionCall(
                        name_tok.value, [expr], [],
                        line=name_tok.line, column=name_tok.column,
                    )
            elif self.check(T.DOUBLE_COLON):
                tok = self.advance()
                type_tok = self.expect(T.IDENT)
                expr = ast.TypeCast(
                    expr, type_tok.value, line=tok.line, column=tok.column
                )
            else:
                return expr

    def parse_primary(self) -> ast.Node:
        if self.match(T.LPAREN):
            expr = self.parse_expression()
            self.expect(T.RPAREN)
            return expr
        if self.check(T.LBRACE):
            return self.parse_set_or_record()
        if self.check(T.MINUS):
            return self.parse_unary_minus()
        if self.check(T.IDENT):
            return self.parse_identifier_or_call()
        return self.parse_literal()

    def parse_unary_minus(self) -> ast.Node:
        tok = self.expect(T.MINUS)
        if self.check(T.INT):
            val = self.advance().value
            return ast.IntLiteral(-val, line=tok.line, column=tok.column)
        if self.check(T.FLOAT):
            val = self.advance().value
            return ast.FloatLiteral(-val, line=tok.line, column=tok.column)
        raise QueryParseError("Expected number after '-'", tok.line, tok.column)

    def parse_set_or_record(self) -> ast.Node:
        brace = self.expect(T.LBRACE)
        if self.match(T.RBRACE):
            return ast.SetLiteral([], line=brace.line, column=brace.column)
        first = self.parse_expression()
        if self.check(T.COLON_EQUALS):
            if not isinstance(first, ast.Identifier):
                raise QueryParseError(
                    "A RecordLiteral requires a simple identifier expression as "
                    "field names",
                    brace.line,
                    brace.column,
                )
            self.advance()
            fields = [ast.RecordField(first.name, self.parse_expression())]
            while self.match(T.COMMA):
                name_tok = self.expect(T.IDENT)
                self.expect(T.COLON_EQUALS)
                fields.append(ast.RecordField(name_tok.value, self.parse_expression()))
            self.expect(T.RBRACE)
            return ast.RecordLiteral(fields, line=brace.line, column=brace.column)
        elements = [first]
        while self.match(T.COMMA):
            elements.append(self.parse_expression())
        self.expect(T.RBRACE)
        return ast.SetLiteral(elements, line=brace.line, column=brace.column)

    def parse_identifier_or_call(self) -> ast.Node:
        tok = self.expect(T.IDENT)
        if self.match(T.LPAREN):
            positional: list[ast.Node] = []
            named: list[tuple[str, ast.Node]] = []
            if not self.check(T.RPAREN):
                positional, named = self.parse_arg_list()
            self.expect(T.RPAREN)
            return ast.FunctionCall(
                tok.value, positional, named, line=tok.line, column=tok.column
            )
        return ast.Identifier(tok.value, line=tok.line, column=tok.column)

    def parse_literal(self) -> ast.Node:
        tok = self.cur
        if tok.type is T.STRING:
            self.advance()
            return ast.StringLiteral(tok.value, line=tok.line, column=tok.column)
        if tok.type is T.INT:
            self.advance()
            return ast.IntLiteral(tok.value, line=tok.line, column=tok.column)
        if tok.type is T.FLOAT:
            self.advance()
            return ast.FloatLiteral(tok.value, line=tok.line, column=tok.column)
        if tok.type is T.BOOL:
            self.advance()
            return ast.BoolLiteral(tok.value, line=tok.line, column=tok.column)
        if tok.type is T.NULL:
            self.advance()
            return ast.NullLiteral(line=tok.line, column=tok.column)
        raise QueryParseError(
            f"Unexpected token {tok.type.value}", tok.line, tok.column
        )

    def parse_arg_list(self) -> tuple[list[ast.Node], list[tuple[str, ast.Node]]]:
        positional: list[ast.Node] = []
        named: list[tuple[str, ast.Node]] = []

        def parse_one() -> None:
            loc = self.cur
            expr = self.parse_expression()
            if self.check(T.COLON_EQUALS):
                if not isinstance(expr, ast.Identifier):
                    raise QueryParseError(
                        "A named argument requires a simple identifier as the "
                        f"name, but got '{ast.describe(expr)}'",
                        loc.line,
                        loc.column,
                    )
                self.advance()
                named.append((expr.name, self.parse_expression()))
                return
            if named:
                raise QueryParseError(
                    "positional argument after named argument is not allowed",
                    loc.line,
                    loc.column,
                )
            positional.append(expr)

        parse_one()
        while self.match(T.COMMA):
            parse_one()
        return positional, named


def parse(text: str) -> ast.Node:
    """Parse a SaneQL query string into an AST."""
    return _Parser(text).parse()
