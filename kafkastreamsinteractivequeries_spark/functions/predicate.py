"""JsonPath-subset predicate compiler → Catalyst ``Column`` expressions.

The reference's ``FilteredRangeQuery`` evaluates a JsonPath filter
expression server-side, inside the state store, before results cross the
wire — e.g. ``@.buys > @.sells``, ``@.symbol == 'CFLT'``, ``@.buys > 299``
(reference ``store/CustomQueryStore.java:68-97`` builds
``$.[?(<predicate>)]`` and runs it over the store's JSON values via
com.jayway.jsonpath; golden cases in
``store/JacksonProtobufMappingProviderTest.java:73-152``).

Here the same predicate language compiles to a ``pyspark.sql.Column``
boolean expression, so Catalyst's ``PushDownPredicates`` pushes it into
the scan — the Spark-native form of the reference's "evaluate inside the
store" optimization, with whole-stage codegen instead of per-row JSON
tree walks.

Grammar (superset of every predicate the reference exercises)::

    expr    := orExpr
    orExpr  := andExpr ( '||' andExpr )*
    andExpr := cmp ( '&&' cmp )*
    cmp     := '(' expr ')' | '!' cmp | operand op operand
    operand := '@.' IDENT ('.' IDENT)* | NUMBER | 'string' | "string"
            | true | false | null
    op      := '==' | '!=' | '>' | '>=' | '<' | '<=' | '=~' (regex)

``compile_predicate(src)`` resolves ``@.field`` to ``F.col(field)`` on a
typed DataFrame; ``compile_predicate(src, json_col="value")`` resolves it
to ``get_json_object(col(json_col), '$.field')`` for raw-JSON value
columns (the reference's physical layout, where the store holds JSON
bytes — SURVEY.md §1.2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lpar>\()|(?P<rpar>\))|
        (?P<or>\|\|)|(?P<and>&&)|
        (?P<op>==|!=|>=|<=|=~|>|<)|
        (?P<not>!)|
        (?P<path>@(?:\.[A-Za-z_][A-Za-z0-9_]*)+)|
        (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)|
        (?P<sq>'(?:[^'\\]|\\.)*')|
        (?P<dq>"(?:[^"\\]|\\.)*")|
        (?P<kw>true|false|null)
    )""",
    re.VERBOSE,
)


class PredicateSyntaxError(ValueError):
    pass


@dataclass
class _Tok:
    kind: str
    text: str


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            rest = src[pos:].strip()
            if not rest:
                break
            raise PredicateSyntaxError(f"unexpected input at {pos}: {rest[:30]!r}")
        pos = m.end()
        kind = m.lastgroup
        assert kind is not None
        toks.append(_Tok(kind, m.group(kind)))
    return toks


class _Parser:
    def __init__(self, toks: list[_Tok], json_col: str | None):
        self.toks = toks
        self.i = 0
        self.json_col = json_col

    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        tok = self._peek()
        if tok is None:
            raise PredicateSyntaxError("unexpected end of predicate")
        self.i += 1
        return tok

    def parse(self) -> Column:
        col = self._or()
        if self._peek() is not None:
            raise PredicateSyntaxError(f"trailing tokens: {self._peek()}")
        return col

    def _or(self) -> Column:
        left = self._and()
        while (t := self._peek()) and t.kind == "or":
            self._next()
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._cmp()
        while (t := self._peek()) and t.kind == "and":
            self._next()
            left = left & self._cmp()
        return left

    def _cmp(self) -> Column:
        tok = self._peek()
        if tok is None:
            raise PredicateSyntaxError("unexpected end of predicate")
        if tok.kind == "lpar":
            self._next()
            inner = self._or()
            if self._next().kind != "rpar":
                raise PredicateSyntaxError("expected ')'")
            return inner
        if tok.kind == "not":
            self._next()
            return ~self._cmp()
        left_tok = self._next()
        op_tok = self._next()
        if op_tok.kind != "op":
            raise PredicateSyntaxError(f"expected comparison operator, got {op_tok.text!r}")
        right_tok = self._next()
        return self._compare(left_tok, op_tok.text, right_tok)

    def _operand(self, tok: _Tok, typed_as: _Tok | None = None) -> Column:
        """Operand → Column.  ``typed_as`` carries the other side of the
        comparison so raw-JSON paths can be cast to a comparable type."""
        if tok.kind == "path":
            fields = tok.text[2:]  # strip '@.'
            if self.json_col is None:
                return F.col(fields)
            col = F.get_json_object(F.col(self.json_col), "$." + fields)
            # get_json_object yields strings; cast numerically when the
            # literal side is numeric so 300 > 299 doesn't compare as text.
            if typed_as is not None and typed_as.kind == "num":
                col = col.cast("double")
            elif typed_as is not None and typed_as.kind == "kw" and typed_as.text in ("true", "false"):
                col = col.cast("boolean")
            elif typed_as is not None and typed_as.kind == "path":
                col = col.cast("double")
            return col
        if tok.kind == "num":
            return F.lit(float(tok.text) if ("." in tok.text or "e" in tok.text.lower()) else int(tok.text))
        if tok.kind in ("sq", "dq"):
            body = tok.text[1:-1]
            body = re.sub(r"\\(.)", r"\1", body)
            return F.lit(body)
        if tok.kind == "kw":
            if tok.text == "null":
                return F.lit(None)
            return F.lit(tok.text == "true")
        raise PredicateSyntaxError(f"bad operand {tok.text!r}")

    def _compare(self, lt: _Tok, op: str, rt: _Tok) -> Column:
        # null comparisons get IS [NOT] NULL semantics (JsonPath-style).
        if rt.kind == "kw" and rt.text == "null":
            left = self._operand(lt)
            return left.isNull() if op == "==" else ~left.isNull()
        left = self._operand(lt, typed_as=rt)
        right = self._operand(rt, typed_as=lt)
        if op == "==":
            return left == right
        if op == "!=":
            return left != right
        if op == ">":
            return left > right
        if op == ">=":
            return left >= right
        if op == "<":
            return left < right
        if op == "<=":
            return left <= right
        if op == "=~":
            return left.rlike(_regex_body(rt))
        raise PredicateSyntaxError(f"unsupported operator {op!r}")


def _regex_body(tok: _Tok) -> str:
    body = tok.text[1:-1] if tok.kind in ("sq", "dq") else tok.text
    # JsonPath regex literals look like /pattern/flags
    m = re.fullmatch(r"/(.*)/[a-z]*", body)
    return m.group(1) if m else body


def compile_predicate(src: str, json_col: str | None = None) -> Column:
    """Compile a JsonPath-subset predicate to a boolean ``Column``.

    >>> df.filter(compile_predicate("@.buys > @.sells"))
    >>> raw.filter(compile_predicate("@.symbol == 'CFLT'", json_col="value"))
    """
    src = src.strip()
    # Accept the full JsonPath filter form the reference builds:
    #   $.[?(<pred>)]  (store/CustomQueryStore.java:91-93)
    m = re.fullmatch(r"\$\.?\[\?\((?P<pred>.*)\)\]", src)
    if m:
        src = m.group("pred")
    return _Parser(_tokenize(src), json_col).parse()
