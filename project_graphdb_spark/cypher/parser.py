"""Tokenizer + recursive-descent parser for the Cypher subset.

Grammar (case-insensitive keywords)::

    query     := MATCH pattern (',' pattern)* [WHERE expr]
                 [WITH items [WHERE expr]]
                 RETURN [DISTINCT] items
                 [ORDER BY key (',' key)*] [LIMIT int]
    pattern   := node (edge node)*
    node      := '(' [var] [':' label] ')'
    edge      := '-[' [var] [':' type] ']->' | '<-[' [var] [':' type] ']-'
    items     := expr [AS alias] (',' expr [AS alias])*

Expressions support AND/OR/NOT, the C7 comparison set (=, <>, <, <=, >,
>=, IN, CONTAINS, STARTS WITH, ENDS WITH), arithmetic, literals, lists,
function calls (incl. DISTINCT args), property access (``a.b``, also on
call results: ``date(x).year``), and ``*`` inside ``count(*)``.
"""

from __future__ import annotations

import re

from project_graphdb_spark.cypher.ast import (
    And,
    BinOp,
    Case,
    Cmp,
    EdgePat,
    Expr,
    FnCall,
    Index,
    IsNull,
    Item,
    ListComp,
    ListExpr,
    ListPred,
    Lit,
    NodePat,
    CallSub,
    Not,
    Or,
    OrderKey,
    Param,
    PathPat,
    PatternCount,
    PatternPred,
    Projection,
    Prop,
    Query,
    Reduce,
    Segment,
    Star,
    Var,
)


class CypherSyntaxError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<arrow_in>&lt;-\[|<-\[)
  | (?P<larrow>\]->)
  | (?P<ledge>-\[)
  | (?P<redge>\]-)
  | (?P<rarrow_bare>-->)
  | (?P<larrow_bare><--)
  | (?P<undir_bare>--)
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><>|<=|>=|\+=|=|<|>|\+|-|\*|/|%|\||\(|\)|\[|\]|\{|\}|,|\.|:)
  | (?P<ident>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "match", "optional", "where", "with", "return", "order", "by",
    "skip", "limit", "as", "and", "or", "not", "in", "contains",
    "starts", "ends", "distinct", "asc", "ascending", "desc",
    "descending", "true", "false", "null", "case", "when", "then",
    "else", "end", "unwind", "is", "union", "all",
    # write-path keywords (cypher/write.py); expect_name still accepts
    # them as label / property names
    "merge", "set",
    # CALL { } subqueries
    "call",
}


def tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise CypherSyntaxError(
                f"unexpected character {text[pos]!r} at offset {pos}"
            )
        pos = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind == "ws":
            continue
        if kind == "ident":
            if val.startswith("`"):
                tokens.append(("ident", val[1:-1]))
            elif val.lower() in KEYWORDS:
                # original case preserved: keywords double as label /
                # rel-type / property names (e.g. [:CONTAINS])
                tokens.append(("kw", val))
            else:
                tokens.append(("ident", val))
        elif kind == "str":
            raw = val[1:-1]
            tokens.append(("str", re.sub(r"\\(.)", r"\1", raw)))
        elif kind == "num":
            tokens.append(("num", val))
        elif kind == "param":
            tokens.append(("param", val[1:]))
        elif kind == "arrow_in":
            tokens.append(("<-[", val))
        elif kind == "larrow":
            tokens.append(("]->", val))
        elif kind == "ledge":
            tokens.append(("-[", val))
        elif kind == "redge":
            tokens.append(("]-", val))
        elif kind == "rarrow_bare":
            tokens.append(("-->", val))
        elif kind == "larrow_bare":
            tokens.append(("<--", val))
        elif kind == "undir_bare":
            tokens.append(("--", val))
        else:
            tokens.append((val, val))
    tokens.append(("eof", ""))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    # -- token helpers ---------------------------------------------------

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def accept(self, kind: str, value: str | None = None) -> str | None:
        k, v = self.peek()
        cmp = v.lower() if kind == "kw" else v
        if k == kind and (value is None or cmp == value):
            self.i += 1
            return cmp
        return None

    def expect(self, kind: str, value: str | None = None) -> str:
        got = self.accept(kind, value)
        if got is None:
            k, v = self.peek()
            raise CypherSyntaxError(
                f"expected {value or kind}, got {v!r} (token {self.i})"
            )
        return got

    def at_kw(self, *kws: str) -> bool:
        k, v = self.peek()
        return k == "kw" and v.lower() in kws

    def expect_name(self) -> str:
        """A label / relationship-type / property name: an identifier,
        or a keyword used as one (original case preserved)."""
        k, v = self.peek()
        if k in ("ident", "kw"):
            self.i += 1
            return v
        raise CypherSyntaxError(f"expected name, got {v!r} (token {self.i})")

    # -- grammar ---------------------------------------------------------

    def parse_query(self) -> Query:
        q = self.parse_single_query()
        union_all: bool | None = None
        while self.accept("kw", "union"):
            is_all = bool(self.accept("kw", "all"))
            if union_all is not None and union_all != is_all:
                raise CypherSyntaxError(
                    "cannot mix UNION and UNION ALL in one query"
                )
            union_all = is_all
            q.unions.append((self.parse_single_query(), is_all))
        self.expect("eof")
        if q.unions:
            # openCypher: ORDER BY/SKIP/LIMIT after the LAST arm applies
            # to the whole union; inside any other arm it is an error.
            # parse_single_query consumes them greedily per arm, so
            # hoist the last arm's and reject the rest.
            for arm in (q, *(a for a, _ in q.unions[:-1])):
                if arm.order_by or arm.skip is not None or (
                    arm.limit is not None
                ):
                    raise CypherSyntaxError(
                        "ORDER BY / SKIP / LIMIT is not allowed inside a "
                        "UNION arm; place it after the last arm to sort "
                        "the whole union"
                    )
            last = q.unions[-1][0]
            q.union_order_by = last.order_by
            q.union_skip = last.skip
            q.union_limit = last.limit
            last.order_by = []
            last.skip = None
            last.limit = None
        return q

    def parse_single_query(self) -> Query:
        if not self.at_kw(
            "match", "optional", "unwind", "return", "with", "call"
        ):
            self.expect("kw", "match")  # uniform error message
        segments = [self.parse_segment()]
        while self.accept("kw", "with"):
            seg = segments[-1]
            seg.projection = self.parse_projection()
            if self.accept("kw", "order"):
                self.expect("kw", "by")
                seg.proj_order.append(self.parse_order_key())
                while self.accept(","):
                    seg.proj_order.append(self.parse_order_key())
            if self.accept("kw", "skip"):
                seg.proj_skip = int(self.expect("num"))
            if self.accept("kw", "limit"):
                seg.proj_limit = int(self.expect("num"))
            if self.accept("kw", "where"):
                seg.proj_where = self.parse_expr()
            segments.append(self.parse_segment())
        q = Query(segments=segments)
        self.expect("kw", "return")
        q.ret = self.parse_projection()
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            q.order_by.append(self.parse_order_key())
            while self.accept(","):
                q.order_by.append(self.parse_order_key())
        if self.accept("kw", "skip"):
            q.skip = int(self.expect("num"))
        if self.accept("kw", "limit"):
            q.limit = int(self.expect("num"))
        return q

    def parse_segment(self) -> Segment:
        """MATCH clauses + OPTIONAL MATCHes + optional WHERE. May be
        empty (between two WITHs, or before RETURN)."""
        seg = Segment()
        clause = 0
        while self.at_kw("match", "unwind", "call"):
            if self.accept("kw", "unwind"):
                expr = self.parse_expr()
                self.expect("kw", "as")
                seg.steps.append(("unwind", len(seg.unwinds)))
                seg.unwinds.append((expr, self.expect_name()))
                continue
            if self.accept("kw", "call"):
                seg.steps.append(("call", len(seg.calls)))
                seg.calls.append(self.parse_call_subquery())
                continue
            self.accept("kw", "match")
            clause += 1
            pats = [self.parse_pattern()]
            while self.accept(","):
                pats.append(self.parse_pattern())
            for p in pats:
                p.clause = clause
            seg.patterns.extend(pats)
        if self.accept("kw", "where"):
            seg.where = self.parse_expr()
        while self.accept("kw", "optional"):
            self.expect("kw", "match")
            pats = [self.parse_pattern()]
            while self.accept(","):
                pats.append(self.parse_pattern())
            # WHERE after an OPTIONAL MATCH belongs to that clause: it
            # filters the optional side, it does not drop unmatched rows
            opt_where = (
                self.parse_expr() if self.accept("kw", "where") else None
            )
            for i, p in enumerate(pats):
                seg.optional_patterns.append(
                    (p, opt_where if i == len(pats) - 1 else None)
                )
        return seg

    def parse_call_subquery(self) -> CallSub:
        """``CALL { [WITH a, b] <single query> }`` (the CALL keyword is
        consumed). The leading WITH is the *importing* WITH — bare
        variable names only (openCypher's subquery scope rule),
        followed by a reading clause or RETURN (``CALL { WITH c RETURN
        c.x AS y }`` is valid); a WITH carrying expressions/aliases is
        a normal projection WITH of the inner query and is backtracked
        to it."""
        self.expect("{")
        imports: list[str] = []
        if self.at_kw("with"):
            save = self.i
            self.next()
            imps: list[str] = []
            ok = True
            while True:
                if self.peek()[0] != "ident":
                    ok = False
                    break
                imps.append(self.next()[1])
                if not self.accept(","):
                    break
            if ok and self.at_kw(
                "match", "unwind", "call", "with", "return"
            ):
                imports = imps
            else:
                self.i = save
        sub = self.parse_single_query()
        self.expect("}")
        return CallSub(imports=imports, query=sub)

    def parse_pattern(self) -> PathPat:
        # `p = shortestPath((a)-[:T*..n]-(b))` or bare `shortestPath(...)`
        k, v = self.peek()
        if k == "ident":
            path_var: str | None = None
            save = self.i
            name = self.next()[1]
            if self.accept("="):
                if self.peek()[0] != "ident":
                    raise CypherSyntaxError(
                        "path variables are only supported with "
                        "shortestPath(...)"
                    )
                fn = self.expect("ident")
                path_var = name
            elif name.lower() in ("shortestpath", "allshortestpaths"):
                fn = name
            else:
                self.i = save
                fn = None
            if fn is not None:
                if fn.lower() not in ("shortestpath", "allshortestpaths"):
                    raise CypherSyntaxError(
                        "path variables are only supported with "
                        f"shortestPath(...); got {fn!r}"
                    )
                self.expect("(")
                pat = self.parse_pattern_body()
                self.expect(")")
                if len(pat.nodes) != 2 or len(pat.edges) != 1:
                    raise CypherSyntaxError(
                        "shortestPath takes a single-relationship "
                        "pattern: (a)-[:T*..n]->(b)"
                    )
                pat.shortest = True
                pat.path_var = path_var
                return pat
        return self.parse_pattern_body()

    def parse_pattern_body(self) -> PathPat:
        nodes = [self.parse_node()]
        edges: list[EdgePat] = []
        while True:
            k, _ = self.peek()
            if k == "-[":
                self.next()
                var, typ, lo, hi, props = self.parse_edge_body()
                if self.accept("]->") is not None:
                    edges.append(
                        EdgePat(
                            var, typ, False, props,
                            min_hops=lo, max_hops=hi,
                        )
                    )
                else:
                    self.expect("]-")  # undirected: -[...]-
                    edges.append(
                        EdgePat(
                            var, typ, False, props,
                            min_hops=lo, max_hops=hi, undirected=True,
                        )
                    )
            elif k == "<-[":
                self.next()
                var, typ, lo, hi, props = self.parse_edge_body()
                self.expect("]-")
                edges.append(
                    EdgePat(var, typ, True, props, min_hops=lo, max_hops=hi)
                )
            elif k == "-->":
                # bracket-less arrows: (a)-->(b) == (a)-[]->(b)
                self.next()
                edges.append(EdgePat(None, None, False))
            elif k == "<--":
                self.next()
                edges.append(EdgePat(None, None, True))
            elif k == "--":
                self.next()
                edges.append(EdgePat(None, None, False, undirected=True))
            else:
                break
            nodes.append(self.parse_node())
        return PathPat(nodes=nodes, edges=edges)

    def parse_node(self) -> NodePat:
        self.expect("(")
        var = None
        label = None
        k, v = self.peek()
        if k == "ident":
            var = self.next()[1]
        labels: list[str] = []
        while self.accept(":"):
            labels.append(self.expect_name())
        if labels:
            label = labels[0]
        props = self.parse_prop_map()
        self.expect(")")
        return NodePat(
            var=var, label=label, props=props, extra_labels=labels[1:]
        )

    def parse_case(self) -> Expr:
        """Searched or simple CASE (the 'case' keyword is consumed).
        Simple form desugars ``CASE e WHEN v`` into ``WHEN e = v``."""
        operand = None
        if not self.at_kw("when"):
            operand = self.parse_expr()
        whens: list[tuple[Expr, Expr]] = []
        while self.accept("kw", "when"):
            cond = self.parse_expr()
            if operand is not None:
                cond = Cmp("=", operand, cond)
            self.expect("kw", "then")
            whens.append((cond, self.parse_expr()))
        if not whens:
            raise CypherSyntaxError("CASE needs at least one WHEN")
        default = self.parse_expr() if self.accept("kw", "else") else None
        self.expect("kw", "end")
        return Case(whens=whens, default=default)

    def parse_prop_map(self) -> list[tuple[str, "Expr"]]:
        """Optional inline ``{name: expr, ...}`` map (equality filters)."""
        props: list[tuple[str, Expr]] = []
        if self.accept("{"):
            while True:
                name = self.expect_name()
                self.expect(":")
                props.append((name, self.parse_expr()))
                if not self.accept(","):
                    break
            self.expect("}")
        return props

    def parse_edge_body(
        self,
    ) -> tuple[
        str | None,
        str | None,
        int | None,
        int | None,
        list[tuple[str, "Expr"]],
    ]:
        var = None
        typ = None
        lo = hi = None
        k, v = self.peek()
        if k == "ident":
            var = self.next()[1]
        if self.accept(":"):
            typ = self.expect_name()
        if self.accept("*"):
            # [*] => 1..DEFAULT; [*n] => n..n; [*n..m] => n..m
            lo, hi = 1, None
            if self.peek()[0] == "num":
                lo = int(self.expect("num"))
                hi = lo
            if self.accept("."):
                self.expect(".")
                hi = None
                if self.peek()[0] == "num":
                    hi = int(self.expect("num"))
        props = self.parse_prop_map()
        return var, typ, lo, hi, props

    def parse_projection(self) -> Projection:
        distinct = bool(self.accept("kw", "distinct"))
        items = [self.parse_item()]
        while self.accept(","):
            items.append(self.parse_item())
        return Projection(items=items, distinct=distinct)

    def parse_item(self) -> Item:
        expr = self.parse_expr()
        alias = None
        if self.accept("kw", "as"):
            k, v = self.next()
            if k not in ("ident", "kw"):
                raise CypherSyntaxError(f"bad alias {v!r}")
            alias = v
        return Item(expr=expr, alias=alias)

    def parse_order_key(self) -> OrderKey:
        expr = self.parse_expr()
        asc = True
        if self.accept("kw", "asc") or self.accept("kw", "ascending"):
            asc = True
        elif self.accept("kw", "desc") or self.accept("kw", "descending"):
            asc = False
        return OrderKey(expr=expr, ascending=asc)

    # -- expressions -----------------------------------------------------

    def parse_expr(self) -> Expr:
        return self.parse_or()

    def parse_or(self) -> Expr:
        parts = [self.parse_and()]
        while self.accept("kw", "or"):
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else Or(parts)

    def parse_and(self) -> Expr:
        parts = [self.parse_not()]
        while self.accept("kw", "and"):
            parts.append(self.parse_not())
        return parts[0] if len(parts) == 1 else And(parts)

    def parse_not(self) -> Expr:
        if self.accept("kw", "not"):
            return Not(self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> Expr:
        left = self.parse_add()
        k, v = self.peek()
        if self.at_kw("is"):
            self.next()
            negated = bool(self.accept("kw", "not"))
            self.expect("kw", "null")
            return IsNull(part=left, negated=negated)
        if k in ("=", "<>", "<", "<=", ">", ">="):
            self.next()
            return Cmp(k, left, self.parse_add())
        if self.at_kw("in"):
            self.next()
            return Cmp("IN", left, self.parse_add())
        if self.at_kw("contains"):
            self.next()
            return Cmp("CONTAINS", left, self.parse_add())
        if self.at_kw("starts"):
            self.next()
            self.expect("kw", "with")
            return Cmp("STARTS_WITH", left, self.parse_add())
        if self.at_kw("ends"):
            self.next()
            self.expect("kw", "with")
            return Cmp("ENDS_WITH", left, self.parse_add())
        return left

    def parse_add(self) -> Expr:
        left = self.parse_mul()
        while True:
            k, _ = self.peek()
            if k in ("+", "-"):
                self.next()
                left = BinOp(k, left, self.parse_mul())
            else:
                return left

    def parse_mul(self) -> Expr:
        left = self.parse_unary()
        while True:
            k, _ = self.peek()
            if k in ("*", "/", "%"):
                # '*' is also RETURN-star; only treat as op inside expr
                self.next()
                left = BinOp(k, left, self.parse_unary())
            else:
                return left

    def parse_unary(self) -> Expr:
        if self.accept("-"):
            inner = self.parse_unary()
            # Fold -literal into a negative Lit so list membership
            # (`x IN [-1, 5]`) and other literal-only contexts see a
            # plain literal, not BinOp(0 - x).
            if (
                isinstance(inner, Lit)
                and isinstance(inner.value, (int, float))
                and not isinstance(inner.value, bool)
            ):
                return Lit(-inner.value)
            return BinOp("-", Lit(0), inner)
        return self.parse_postfix()

    def parse_postfix(self) -> Expr:
        e = self.parse_primary()
        while True:
            if self.accept("."):
                name = self.expect_name()
                if isinstance(e, Var):
                    e = Prop(base=e.name, name=name)
                else:
                    e = Prop(base=e, name=name)
            elif self.accept("["):
                idx = self.parse_expr()
                self.expect("]")
                e = Index(base=e, index=idx)
            else:
                return e

    def parse_primary(self) -> Expr:
        k, v = self.peek()
        if k == "num":
            self.next()
            return Lit(float(v) if "." in v else int(v))
        if k == "str":
            self.next()
            return Lit(v)
        if k == "kw" and v.lower() == "case":
            self.next()
            return self.parse_case()
        if k == "kw" and v.lower() in ("true", "false"):
            self.next()
            return Lit(v.lower() == "true")
        if k == "kw" and v.lower() == "null":
            self.next()
            return Lit(None)
        if k == "*":
            self.next()
            return Star()
        if k == "param":
            self.next()
            return Param(v)
        if k == "(":
            # bare pattern predicate: WHERE (a)-[:T]->(b) — the
            # canonical Cypher idiom an LLM emits constantly
            # (exists() wrapping is the older dialect). Desugars to the
            # same PatternPred the exists()/EXISTS{} forms produce
            # (left-semi/anti lowering). Backtracking disambiguates: a
            # parenthesized *expression* fails the pattern parse (or
            # yields no edges) and falls through unchanged.
            save = self.i
            try:
                pat = self.parse_pattern_body()
                if pat.edges:
                    return PatternPred(pat)
            except CypherSyntaxError:
                pass
            self.i = save
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return e
        if k == "[":
            self.next()
            # [x IN src ...] — list comprehension (2-token lookahead)
            if (
                self.peek()[0] == "ident"
                and self.toks[self.i + 1][0] == "kw"
                and self.toks[self.i + 1][1].lower() == "in"
            ):
                var = self.next()[1]
                self.expect("kw", "in")
                source = self.parse_expr()
                where = (
                    self.parse_expr() if self.accept("kw", "where") else None
                )
                map_expr = self.parse_expr() if self.accept("|") else None
                self.expect("]")
                return ListComp(var, source, where, map_expr)
            items = []
            if not self.accept("]"):
                items.append(self.parse_expr())
                while self.accept(","):
                    items.append(self.parse_expr())
                self.expect("]")
            return ListExpr(items)
        if k == "kw" and v.lower() == "all" and self.toks[self.i + 1][0] == "(":
            # all(x IN src WHERE pred) — `all` doubles as the UNION ALL
            # keyword, so it arrives as a kw token here
            self.next()
            self.expect("(")
            lvar = self.expect("ident")
            self.expect("kw", "in")
            source = self.parse_expr()
            self.expect("kw", "where")
            pred = self.parse_expr()
            self.expect(")")
            return ListPred("all", lvar, source, pred)
        if k == "ident":
            self.next()
            # EXISTS { MATCH (a)-[:T]->(b) [WHERE expr] } and
            # COUNT { ... } — block subquery forms
            if v.lower() in ("exists", "count") and self.peek()[0] == "{":
                self.next()
                self.accept("kw", "match")
                pat = self.parse_pattern()
                blk_where = (
                    self.parse_expr() if self.accept("kw", "where") else None
                )
                self.expect("}")
                if v.lower() == "count":
                    return PatternCount(pat, where=blk_where)
                return PatternPred(pat, where=blk_where)
            if self.accept("("):
                # exists((a)-[:T]->(b)) — pattern predicate: the
                # argument starts with '(' (a node pattern); a
                # parenthesized *expression* argument to exists() is
                # indistinguishable at this point and not supported
                # (use exists(x.prop) without extra parens)
                if v.lower() == "exists" and self.peek()[0] == "(":
                    pat = self.parse_pattern()
                    self.expect(")")
                    return PatternPred(pat)
                # any/all/none/single(x IN src WHERE pred)
                if (
                    v.lower() in ("any", "all", "none", "single")
                    and self.peek()[0] == "ident"
                    and self.toks[self.i + 1][0] == "kw"
                    and self.toks[self.i + 1][1].lower() == "in"
                ):
                    lvar = self.next()[1]
                    self.expect("kw", "in")
                    source = self.parse_expr()
                    self.expect("kw", "where")
                    pred = self.parse_expr()
                    self.expect(")")
                    return ListPred(v.lower(), lvar, source, pred)
                # reduce(acc = init, x IN src | expr)
                if v.lower() == "reduce":
                    acc = self.expect("ident")
                    self.expect("=")
                    init = self.parse_expr()
                    self.expect(",")
                    lvar = self.expect("ident")
                    self.expect("kw", "in")
                    source = self.parse_expr()
                    self.expect("|")
                    expr = self.parse_expr()
                    self.expect(")")
                    return Reduce(acc, init, lvar, source, expr)
                distinct = bool(self.accept("kw", "distinct"))
                args: list[Expr] = []
                if not self.accept(")"):
                    args.append(self.parse_expr())
                    while self.accept(","):
                        args.append(self.parse_expr())
                    self.expect(")")
                return FnCall(v.lower(), args, distinct=distinct)
            return Var(v)
        raise CypherSyntaxError(f"unexpected token {v!r} in expression")


def parse(text: str) -> Query:
    return _Parser(tokenize(text)).parse_query()
