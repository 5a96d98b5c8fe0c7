"""SaneQL tokenizer (reference: ``saneql/lexer.cpp``, token set ``token.h``).

Tokens: literals (int/float/string/bool/null), identifiers (bare or
``"quoted"``), ``. :: := = != <> < <= > >= && || ! - ( ) { } ,`` and
``--``-to-end-of-line comments. Strings are single-quoted with ``''`` as the
escaped quote; quoted identifiers use ``""`` likewise.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any

from lapis_silo_spark.expressions.base import QueryCompileError


class QueryParseError(QueryCompileError):
    """Lex/parse failure; carries a 1-based (line, column) location."""

    def __init__(self, message: str, line: int = 1, column: int = 1):
        super().__init__(f"{message} at {line}:{column}")
        self.line = line
        self.column = column


class T(enum.Enum):
    INT = "int literal"
    FLOAT = "float literal"
    STRING = "string literal"
    BOOL = "bool literal"
    NULL = "null"
    IDENT = "identifier"
    DOT = "'.'"
    DOUBLE_COLON = "'::'"
    COLON_EQUALS = "':='"
    EQUALS = "'='"
    NOT_EQUALS = "'!='"
    LESS_THAN = "'<'"
    LESS_EQUAL = "'<='"
    GREATER_THAN = "'>'"
    GREATER_EQUAL = "'>='"
    AND = "'&&'"
    OR = "'||'"
    NOT = "'!'"
    MINUS = "'-'"
    LPAREN = "'('"
    RPAREN = "')'"
    LBRACE = "'{'"
    RBRACE = "'}'"
    COMMA = "','"
    EOF = "end of input"


@dataclass
class Token:
    type: T
    value: Any
    line: int
    column: int


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i = 0
    line = 1
    col = 1
    n = len(text)

    def advance(k: int = 1) -> None:
        nonlocal i, line, col
        for _ in range(k):
            if i < n and text[i] == "\n":
                line += 1
                col = 1
            else:
                col += 1
            i += 1

    while i < n:
        ch = text[i]
        # whitespace + `--` comments
        if ch in " \t\r\n":
            advance()
            continue
        if ch == "-" and i + 1 < n and text[i + 1] == "-":
            while i < n and text[i] != "\n":
                advance()
            continue

        start_line, start_col = line, col

        if ch == "'":  # string literal, '' escapes '
            advance()
            buf: list[str] = []
            while True:
                if i >= n:
                    raise QueryParseError(
                        "Unterminated string literal", start_line, start_col
                    )
                if text[i] == "'":
                    advance()
                    if i < n and text[i] == "'":
                        buf.append("'")
                        advance()
                        continue
                    break
                buf.append(text[i])
                advance()
            tokens.append(Token(T.STRING, "".join(buf), start_line, start_col))
            continue

        if ch == '"':  # quoted identifier, "" escapes "
            advance()
            buf = []
            while True:
                if i >= n:
                    raise QueryParseError(
                        "Unterminated quoted identifier", start_line, start_col
                    )
                if text[i] == '"':
                    advance()
                    if i < n and text[i] == '"':
                        buf.append('"')
                        advance()
                        continue
                    break
                buf.append(text[i])
                advance()
            tokens.append(Token(T.IDENT, "".join(buf), start_line, start_col))
            continue

        if ch.isdigit():
            # scan alnum+dot like the reference (so `1x` errors, `1.5` floats)
            j = i
            is_float = False
            while j < n and (text[j].isalnum() or text[j] == "."):
                # `1.filter(...)` style method calls don't exist on numbers in
                # the grammar, but `1..2` would be invalid anyway — a dot
                # followed by a non-digit ends the number (matches how golden
                # queries never use method calls on numeric literals).
                if text[j] == ".":
                    if j + 1 < n and text[j + 1].isdigit():
                        is_float = True
                    else:
                        break
                j += 1
            word = text[i:j]
            advance(j - i)
            if is_float:
                try:
                    tokens.append(Token(T.FLOAT, float(word), start_line, start_col))
                except ValueError:
                    raise QueryParseError("Invalid float literal", start_line, start_col)
            else:
                if not word.isdigit():
                    raise QueryParseError(
                        "Invalid integer literal", start_line, start_col
                    )
                tokens.append(Token(T.INT, int(word), start_line, start_col))
            continue

        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            advance(j - i)
            if word == "true":
                tokens.append(Token(T.BOOL, True, start_line, start_col))
            elif word == "false":
                tokens.append(Token(T.BOOL, False, start_line, start_col))
            elif word == "null":
                tokens.append(Token(T.NULL, None, start_line, start_col))
            else:
                tokens.append(Token(T.IDENT, word, start_line, start_col))
            continue

        two = text[i : i + 2]
        if two == "::":
            advance(2)
            tokens.append(Token(T.DOUBLE_COLON, None, start_line, start_col))
        elif two == ":=":
            advance(2)
            tokens.append(Token(T.COLON_EQUALS, None, start_line, start_col))
        elif two == "!=" or two == "<>":
            advance(2)
            tokens.append(Token(T.NOT_EQUALS, None, start_line, start_col))
        elif two == "<=":
            advance(2)
            tokens.append(Token(T.LESS_EQUAL, None, start_line, start_col))
        elif two == ">=":
            advance(2)
            tokens.append(Token(T.GREATER_EQUAL, None, start_line, start_col))
        elif two == "&&":
            advance(2)
            tokens.append(Token(T.AND, None, start_line, start_col))
        elif two == "||":
            advance(2)
            tokens.append(Token(T.OR, None, start_line, start_col))
        elif ch == ".":
            advance()
            tokens.append(Token(T.DOT, None, start_line, start_col))
        elif ch == "=":
            advance()
            tokens.append(Token(T.EQUALS, None, start_line, start_col))
        elif ch == "<":
            advance()
            tokens.append(Token(T.LESS_THAN, None, start_line, start_col))
        elif ch == ">":
            advance()
            tokens.append(Token(T.GREATER_THAN, None, start_line, start_col))
        elif ch == "!":
            advance()
            tokens.append(Token(T.NOT, None, start_line, start_col))
        elif ch == "-":
            advance()
            tokens.append(Token(T.MINUS, None, start_line, start_col))
        elif ch == "(":
            advance()
            tokens.append(Token(T.LPAREN, None, start_line, start_col))
        elif ch == ")":
            advance()
            tokens.append(Token(T.RPAREN, None, start_line, start_col))
        elif ch == "{":
            advance()
            tokens.append(Token(T.LBRACE, None, start_line, start_col))
        elif ch == "}":
            advance()
            tokens.append(Token(T.RBRACE, None, start_line, start_col))
        elif ch == ",":
            advance()
            tokens.append(Token(T.COMMA, None, start_line, start_col))
        else:
            raise QueryParseError(f"Unexpected character {ch!r}", line, col)

    tokens.append(Token(T.EOF, None, line, col))
    return tokens
