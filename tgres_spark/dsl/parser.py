"""Graphite target-expression parser.

Reference: dsl/dsl.go — tgres parses targets by leaning on go/ast
(a target happens to be a valid Go expression, dsl.go:20-44). Python
has no such free lunch for `foo.*.bar` selectors, so this is a small
recursive-descent parser over three node kinds:

    Pattern  — series selector with globs: web.*.hits, a.{b,c}.d[0-9]
    Call     — function(arg, ...): alias, movingAverage(x, 5), ...
    Literal  — number / 'string' / "string" / true / false

Grammar:
    expr    := call | pattern | literal
    call    := IDENT '(' [expr (',' expr)*] ')'
    pattern := segment ('.' segment)*   (globs allowed in segments)
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class Pattern:
    text: str


@dataclass
class Literal:
    value: float | str | bool


@dataclass
class Call:
    func: str
    args: list


_WORD_CHARS = r"[A-Za-z0-9_*?\[\]\-:.]"
_TOKEN = re.compile(
    rf"""
    (?P<ws>\s+)
  | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?(?!{_WORD_CHARS}|\{{))
  | (?P<str>'[^']*'|"[^"]*")
  | (?P<sym>[(),])
  | (?P<word>(?:{_WORD_CHARS}|\{{[^}}]*\}})+)
    """,
    re.VERBOSE,
)

_NUMERIC_WORD = re.compile(r"-?\d+(\.\d+)?([eE][+-]?\d+)?")


def tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise SyntaxError(f"bad character at {i}: {src[i:i + 10]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    return out


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else ("eof", "")

    def take(self):
        t = self.peek()
        self.pos += 1
        return t

    def parse(self):
        node = self.expr()
        if self.peek()[0] != "eof":
            raise SyntaxError(f"trailing input: {self.toks[self.pos:]}")
        return node

    def expr(self):
        kind, text = self.peek()
        if kind == "num":
            self.take()
            return Literal(float(text))
        if kind == "str":
            self.take()
            return Literal(text[1:-1])
        if kind == "word":
            # word '(' → call; otherwise a pattern
            if (
                self.pos + 1 < len(self.toks)
                and self.toks[self.pos + 1] == ("sym", "(")
                and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", text)
            ):
                self.take()
                self.take()  # '('
                args = []
                if self.peek() != ("sym", ")"):
                    args.append(self.expr())
                    while self.peek() == ("sym", ","):
                        self.take()
                        args.append(self.expr())
                if self.take() != ("sym", ")"):
                    raise SyntaxError(f"expected ')' in {text}(...)")
                return Call(text, args)
            self.take()
            if text == "true":
                return Literal(True)
            if text == "false":
                return Literal(False)
            if _NUMERIC_WORD.fullmatch(text):
                # a digits-only "pattern" is a number (same ambiguity
                # exists in graphite; numbers win)
                return Literal(float(text))
            return Pattern(text)
        raise SyntaxError(f"unexpected token {self.peek()}")


def parse(src: str):
    return Parser(src).parse()


def glob_to_regex(glob: str) -> str:
    """Graphite glob → anchored regex: '*' and '?' stay within a dot
    segment; '{a,b}' alternates; '[...]' char classes pass through.
    (reference: dsl/fs_find_cache.go converts the same way)"""
    out, i = [], 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            out.append("[^.]*")
        elif c == "?":
            out.append("[^.]")
        elif c == "{":
            j = glob.index("}", i)
            alts = glob[i + 1 : j].split(",")
            out.append("(" + "|".join(re.escape(a) for a in alts) + ")")
            i = j
        elif c == "[":
            j = glob.index("]", i)
            out.append(glob[i : j + 1])
            i = j
        elif c == ".":
            out.append(r"\.")
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"
