"""Cypher-subset parser → flat clause list.

A faithful reimplementation of the reference grammar semantics
(src/gql/cypher_spec.rs:64-736): keyword-boundary splitting on the
uppercased text, brace-aware comma splitting, end-peeling of SKIP/LIMIT,
and the reference's defensive truncation heuristics. The quirks are
intentional and load-bearing for parity — e.g. DISTINCT must directly
follow RETURN/WITH, ORDER BY is located by *last* occurrence, and a
top-level CREATE splits its RETURN case-sensitively (cypher_spec.rs:643).
"""

from __future__ import annotations

from graph_loom_spark.cypher.ast import (
    Clause,
    Create,
    CypherError,
    Delete,
    Expr,
    FuncId,
    Match,
    Merge,
    NodeOnly,
    NodePattern,
    PathPattern,
    Pattern,
    Prop,
    RelPattern,
    RemoveClause,
    Return,
    SetClause,
    StrLit,
    Var,
    Where,
    With,
)


def find_keyword_boundary(hay_up: str, kw_up: str) -> int | None:
    """First index of ``kw_up`` in ``hay_up`` delimited by whitespace/ends
    (cypher_spec.rs:64-83)."""
    n, m = len(hay_up), len(kw_up)
    if m == 0 or m > n:
        return None
    i = 0
    while i + m <= n:
        prev_ok = i == 0 or hay_up[i - 1].isspace()
        if prev_ok and hay_up[i : i + m] == kw_up:
            next_ok = i + m >= n or hay_up[i + m].isspace()
            if next_ok:
                return i
        i += 1
    return None


def trim_quotes(s: str) -> str:
    t = s.strip()
    if (t.startswith('"') and t.endswith('"')) or (t.startswith("'") and t.endswith("'")):
        return t[1:-1]
    return t


def parse_props(block: str) -> dict[str, str]:
    """``k:"v", a:$p`` map blocks; values trim-quoted, params kept raw."""
    out: dict[str, str] = {}
    inner = block.strip()
    if not inner:
        return out
    for part in inner.split(","):
        kv = part.split(":", 1)
        if len(kv) != 2:
            raise CypherError(f"invalid property: {part}")
        out[kv[0].strip()] = trim_quotes(kv[1].strip())
    return out


def split_top_level_comma(s: str) -> list[str]:
    """Split on commas not inside ``{}`` (cypher_spec.rs:203-222)."""
    out: list[str] = []
    level = 0
    start = 0
    for i, c in enumerate(s):
        if c == "{":
            level += 1
        elif c == "}":
            level -= 1
        elif c == "," and level == 0:
            out.append(s[start:i].strip())
            start = i + 1
    out.append(s[start:].strip())
    return out


def parse_node_pattern(s: str) -> NodePattern:
    """``(var:Label {k:"v"})`` | ``(:Label)`` | ``(var)`` | ``(var.Label)``
    shorthand (cypher_spec.rs:106-139)."""
    if not (s.startswith("(") and s.endswith(")")):
        raise CypherError(f"invalid node pattern: {s}")
    inner = s[1:-1]
    np = NodePattern()
    if "{" in inner:
        b = inner.find("{")
        e = inner.rfind("}")
        if e < 0:
            raise CypherError("unclosed properties")
        body, props = inner[:b], inner[b + 1 : e]
    else:
        body, props = inner, None
    body = body.strip()
    if not body:
        pass  # anonymous
    elif ":" in body:
        col = body.find(":")
        v, lab = body[:col].strip(), body[col + 1 :].strip()
        np.var = v or None
        np.label = lab or None
    elif "." in body:
        dot = body.find(".")
        v, lab = body[:dot].strip(), body[dot + 1 :].strip()
        np.var = v or None
        np.label = lab or None
    else:
        np.var = body
    if props is not None:
        np.props = parse_props(props)
    return np


def parse_rel_pattern(s: str) -> RelPattern:
    """``-[r:TYPE {..}]->`` / ``-[:TYPE*1..3]-`` etc. (cypher_spec.rs:141-201)."""
    if not s.startswith("-[") or not (s.endswith("]-") or s.endswith("]->") or s.endswith("-]")):
        raise CypherError(f"invalid rel pattern: {s}")
    right = s.endswith("]->")
    mid = s[2 : len(s) - (3 if right else 2)]
    rp = RelPattern(right=right)
    rest = mid.strip()
    if "{" in rest:
        b = rest.find("{")
        e = rest.rfind("}")
        if e < 0:
            raise CypherError("unclosed relationship properties")
        before, props_block = rest[:b], rest[b + 1 : e]
    else:
        before, props_block = rest, None
    star = before.rfind("*")
    if star >= 0:
        head, rng = before[:star].strip(), before[star + 1 :].strip()
    else:
        head, rng = before, None
    if ":" in head:
        col = head.find(":")
        v, t = head[:col].strip(), head[col + 1 :].strip()
        rp.var = v or None
        rp.typ = t or None
    elif head.strip():
        rp.var = head.strip()
    if rng is not None:
        if rng:
            if ".." in rng:
                parts = rng.split("..")
                if len(parts) != 2:
                    raise CypherError(f"invalid variable-length range: *{rng}")
                rp.min_len = _parse_usize(parts[0], rng, "min") if parts[0].strip() else None
                rp.max_len = _parse_usize(parts[1], rng, "max") if parts[1].strip() else None
            else:
                n = _parse_usize(rng, rng, "length")
                rp.min_len = rp.max_len = n
        else:
            rp.min_len, rp.max_len = 1, None  # bare * → 1..cap
    if props_block is not None:
        rp.props = parse_props(props_block)
    return rp


def _parse_usize(s: str, rng: str, what: str) -> int:
    try:
        n = int(s.strip())
        if n < 0:
            raise ValueError
        return n
    except ValueError:
        raise CypherError(f"invalid {what} in *{rng}") from None


_CLAUSE_WORDS = ("WHERE", "RETURN", "DELETE", "DETACH DELETE", "CREATE", "MERGE", "SET ", "REMOVE ")


def parse_pattern(s: str) -> Pattern:
    """Node or 1-segment path, with the reference's defensive truncation of
    trailing clause text (cypher_spec.rs:224-277)."""
    s = s.strip()
    if s.startswith("("):
        pidx = s.find(")")
        if pidx >= 0:
            after = s[pidx + 1 :].upper()
            if any(w in after for w in _CLAUSE_WORDS):
                s = s[: pidx + 1]
    mid_start = s.find("-[")
    if mid_start >= 0:
        left_end = s[:mid_start].rfind(")")
        if left_end < 0:
            raise CypherError("bad path left")
        left = s[: left_end + 1]
        k = s.find("]", mid_start)
        if k < 0:
            raise CypherError(f"bad relationship pattern (no closing ]): {s}")
        after_br = k + 1
        right_dir = s[after_br : after_br + 2] == "->"
        rp_idx = s.find("(", after_br)
        if rp_idx < 0:
            raise CypherError("bad path right (no right node)")
        rel_slice = s[mid_start:rp_idx]
        right = s[rp_idx:]
        rp = parse_rel_pattern(rel_slice)
        rp.right = right_dir
        return PathPattern(parse_node_pattern(left), rp, parse_node_pattern(right))
    return NodeOnly(parse_node_pattern(s))


def parse_return_items(s: str) -> list[Expr]:
    """Bare var / var.prop / id(var) / quoted string (cypher_spec.rs:279-297)."""
    items: list[Expr] = []
    for part in s.split(","):
        p = part.strip()
        if p.upper().startswith("ID(") and p.endswith(")"):
            items.append(FuncId(p[3:-1].strip()))
        elif "." in p:
            dot = p.find(".")
            items.append(Prop(p[:dot].strip(), p[dot + 1 :].strip()))
        elif p.startswith('"') or p.startswith("'"):
            items.append(StrLit(trim_quotes(p)))
        else:
            items.append(Var(p))
    return items


def parse_order_by(s: str) -> list[tuple[Expr, bool]]:
    """Per-key trailing ASC/DESC (cypher_spec.rs:299-331)."""
    out: list[tuple[Expr, bool]] = []
    for part in s.split(","):
        p = part.strip()
        pu = p.upper()
        asc = True
        expr_str = p
        idx = pu.rfind(" DESC")
        if idx >= 0 and not p[idx + 5 :].strip():
            asc = False
            expr_str = p[:idx]
        else:
            idx = pu.rfind(" ASC")
            if idx >= 0 and not p[idx + 4 :].strip():
                expr_str = p[:idx]
        e = expr_str.strip()
        if e.upper().startswith("ID(") and e.endswith(")"):
            expr: Expr = FuncId(e[3:-1].strip())
        elif "." in e:
            dot = e.find(".")
            expr = Prop(e[:dot].strip(), e[dot + 1 :].strip())
        else:
            expr = Var(e)
        out.append((expr, asc))
    return out


def _peel_skip_limit(body: str) -> tuple[str, int | None, int | None]:
    """Iteratively peel trailing `` LIMIT n`` / `` SKIP n`` (order-insensitive,
    last occurrence, whole-tail must parse as an int) — cypher_spec.rs:489-506."""
    limit: int | None = None
    skip: int | None = None
    working = body
    while True:
        up = working.upper()
        idx = up.rfind(" LIMIT ")
        if idx >= 0:
            tail = working[idx + 7 :].strip()
            if tail.isdigit():
                limit = int(tail)
                working = working[:idx].rstrip()
                continue
        idx = up.rfind(" SKIP ")
        if idx >= 0:
            tail = working[idx + 6 :].strip()
            if tail.isdigit():
                skip = int(tail)
                working = working[:idx].rstrip()
                continue
        break
    return working, skip, limit


def _split_order_by(working: str) -> tuple[str, list[tuple[Expr, bool]]]:
    up = working.upper()
    i = up.rfind(" ORDER BY ")
    if i >= 0:
        return working[:i], parse_order_by(working[i + 10 :].strip())
    return working, []


def _parse_return_tail(body: str, allow_distinct: bool = True) -> Return:
    body = body.strip()
    distinct = False
    if allow_distinct and body.upper().startswith("DISTINCT "):
        distinct = True
        body = body[9:].strip()
    working, skip, limit = _peel_skip_limit(body)
    items_part, order_by = _split_order_by(working)
    return Return(parse_return_items(items_part.strip()), distinct, order_by, skip, limit)


def _parse_with_tail(body: str) -> tuple[With, str | None]:
    """WITH body (+ optional trailing RETURN text) — cypher_spec.rs:516-589."""
    body = body.strip()
    distinct = False
    if body.upper().startswith("DISTINCT "):
        distinct = True
        body = body[9:].strip()
    trailing_return: str | None = None
    i = find_keyword_boundary(body.upper(), "RETURN")
    if i is not None:
        trailing_return = body[i:]
        body = body[:i].strip()
    working, skip, limit = _peel_skip_limit(body)
    items_part, order_by = _split_order_by(working)
    return With(parse_return_items(items_part.strip()), distinct, order_by, skip, limit), trailing_return


def parse(query: str) -> list[Clause]:
    """Statement → clause list (cypher_spec.rs:333-736)."""
    q = query.strip()
    up = q.upper()
    clauses: list[Clause] = []

    if up.startswith("MATCH ") or up.startswith("OPTIONAL MATCH "):
        optional = up.startswith("OPTIONAL MATCH ")
        pstart = 15 if optional else 6
        rest = q[pstart:].strip()
        rest_up = rest.upper()
        where_part: str | None = None
        deferred_set: list[str] | None = None
        deferred_remove: list[str] | None = None
        tail: str | None = None

        i = find_keyword_boundary(rest_up, "RETURN")
        if i is not None:
            head = rest[:i]
            head_up = head.upper()
            where_pos = find_keyword_boundary(head_up, "WHERE")
            set_pos = find_keyword_boundary(head_up, "SET")
            rem_pos = find_keyword_boundary(head_up, "REMOVE")
            cut_idx = min([p for p in (where_pos, set_pos, rem_pos) if p is not None], default=len(head))
            patterns_str = head[:cut_idx]
            if where_pos is not None:
                w_body = head[where_pos:].removeprefix("WHERE").lstrip()
                w_up = w_body.upper()
                si = find_keyword_boundary(w_up, "SET")
                ri = find_keyword_boundary(w_up, "REMOVE")
                if si is not None:
                    w_body = w_body[:si]
                elif ri is not None:
                    w_body = w_body[:ri]
                where_part = w_body.strip()
            if set_pos is not None:
                s_body = head[set_pos:].removeprefix("SET").lstrip()
                ri = find_keyword_boundary(s_body.upper(), "REMOVE")
                deferred_set = split_top_level_comma(s_body[:ri] if ri is not None else s_body)
            if rem_pos is not None:
                r_body = head[rem_pos:].removeprefix("REMOVE").lstrip()
                deferred_remove = split_top_level_comma(r_body)
            tail = rest[i:]
        else:
            i = find_keyword_boundary(rest_up, "WHERE")
            if i is not None:
                patterns_str = rest[:i]
                w_and_tail = rest[i:].removeprefix("WHERE").lstrip()
                w_up = w_and_tail.upper()
                k = find_keyword_boundary(w_up, "RETURN")
                if k is not None:
                    where_part = w_and_tail[:k]
                    tail = w_and_tail[k:]
                else:
                    k = find_keyword_boundary(w_up, "SET")
                    if k is not None:
                        deferred_set = split_top_level_comma(w_and_tail[:k])
                        tail = w_and_tail[k:]
                    else:
                        k = find_keyword_boundary(w_up, "REMOVE")
                        if k is not None:
                            deferred_remove = split_top_level_comma(w_and_tail[:k])
                            tail = w_and_tail[k:]
                        else:
                            for kw in ("MERGE", "CREATE", "DETACH DELETE", "DELETE"):
                                k = find_keyword_boundary(w_up, kw)
                                if k is not None:
                                    where_part = w_and_tail[:k]
                                    tail = w_and_tail[k:]
                                    break
                            else:
                                where_part = w_and_tail
            else:
                for kw in ("MERGE", "CREATE", "WITH"):
                    i = find_keyword_boundary(rest_up, kw)
                    if i is not None:
                        patterns_str, tail = rest[:i], rest[i:]
                        break
                else:
                    i = find_keyword_boundary(rest_up, "SET")
                    if i is not None:
                        patterns_str, tail = rest[:i], rest[i:]
                        s_body = rest[i:].removeprefix("SET").lstrip()
                        ri = find_keyword_boundary(s_body.upper(), "REMOVE")
                        deferred_set = split_top_level_comma(s_body[:ri] if ri is not None else s_body)
                    else:
                        i = find_keyword_boundary(rest_up, "REMOVE")
                        if i is not None:
                            patterns_str, tail = rest[:i], rest[i:]
                            r_body = rest[i:].removeprefix("REMOVE").lstrip()
                            deferred_remove = split_top_level_comma(r_body)
                        else:
                            i = find_keyword_boundary(rest_up, "DETACH DELETE")
                            if i is None:
                                i = find_keyword_boundary(rest_up, "DELETE")
                            if i is not None:
                                patterns_str, tail = rest[:i], rest[i:]
                            else:
                                patterns_str = rest

        # fallback plain-find WHERE split (cypher_spec.rs:453-460)
        if tail is None and where_part is None and deferred_set is None and deferred_remove is None:
            j = rest_up.find("WHERE")
            if j >= 0:
                where_part = rest[j + 5 :].strip()
                patterns_str = rest[:j]

        # defensive truncation of trailing clause text (cypher_spec.rs:462-469)
        pat_up = patterns_str.upper()
        cut = len(patterns_str)
        for kw in (" DETACH DELETE ", " DELETE ", " RETURN ", " SET ", " REMOVE "):
            j = pat_up.find(kw)
            if 0 <= j < cut:
                cut = j
        patterns = [parse_pattern(p) for p in split_top_level_comma(patterns_str[:cut]) if p]
        clauses.append(Match(optional, patterns))
        if where_part is not None:
            clauses.append(Where(where_part.strip()))
        if deferred_set is not None:
            clauses.append(SetClause(deferred_set))
        if deferred_remove is not None:
            clauses.append(RemoveClause(deferred_remove))

        if tail is not None:
            t = tail.strip()
            tup = t.upper()
            if tup.startswith("RETURN "):
                clauses.append(_parse_return_tail(t[7:]))
            elif tup.startswith("WITH "):
                w, trailing = _parse_with_tail(t[5:])
                clauses.append(w)
                if trailing is not None:
                    clauses.append(_parse_return_tail(trailing[6:]))
            elif tup.startswith("CREATE "):
                pats = t[6:].strip()
                clauses.append(Create([parse_pattern(p) for p in split_top_level_comma(pats) if p]))
            elif tup.startswith("MERGE "):
                clauses.append(Merge(parse_pattern(t[6:].strip())))
            elif tup.startswith("DELETE "):
                clauses.append(Delete([v.strip() for v in split_top_level_comma(t[7:])], False))
            elif tup.startswith("DETACH DELETE "):
                clauses.append(Delete([v.strip() for v in split_top_level_comma(t[14:])], True))
            elif tup.startswith("SET "):
                body = t[4:].strip()
                j = body.upper().find(" RETURN ")
                if j >= 0:
                    clauses.append(SetClause(split_top_level_comma(body[:j])))
                    clauses.append(Return(parse_return_items(body[j + 8 :].strip())))
                else:
                    clauses.append(SetClause(split_top_level_comma(body)))
            elif tup.startswith("REMOVE "):
                body = t[7:].strip()
                j = body.upper().find(" RETURN ")
                if j >= 0:
                    clauses.append(RemoveClause(split_top_level_comma(body[:j])))
                    clauses.append(Return(parse_return_items(body[j + 8 :].strip())))
                else:
                    clauses.append(RemoveClause(split_top_level_comma(body)))
        return clauses

    if up.startswith("CREATE"):
        body = q[6:].strip()
        # NOTE: case-SENSITIVE " RETURN " split, matching cypher_spec.rs:643
        parts = body.split(" RETURN ", 1)
        pats = parts[0]
        clauses.append(Create([parse_pattern(p) for p in split_top_level_comma(pats) if p]))
        if len(parts) > 1:
            clauses.append(_parse_return_tail(parts[1], allow_distinct=False))
        return clauses

    if up.startswith("MERGE "):
        clauses.append(Merge(parse_pattern(q[6:].strip())))
        return clauses

    if up.startswith("WITH "):
        body = q[5:].strip()
        working, skip, limit = _peel_skip_limit(body)
        items_part, order_by = _split_order_by(working)
        clauses.append(With(parse_return_items(items_part.strip()), False, order_by, skip, limit))
        return clauses

    if up.startswith("SET "):
        clauses.append(SetClause(split_top_level_comma(q[4:])))
        return clauses

    if up.startswith("REMOVE "):
        clauses.append(RemoveClause(split_top_level_comma(q[7:])))
        return clauses

    if up.startswith("DELETE "):
        clauses.append(Delete([v.strip() for v in split_top_level_comma(q[7:])], False))
        return clauses

    if up.startswith("DETACH DELETE "):
        clauses.append(Delete([v.strip() for v in split_top_level_comma(q[14:])], True))
        return clauses

    raise CypherError("Unsupported or unrecognized Cypher statement")


def resolve_param(raw: str, params: dict[str, str]) -> str:
    """``$name`` lookup or trim-quoted literal (cypher_spec.rs:738-746)."""
    t = raw.strip()
    if t.startswith("$"):
        key = t[1:]
        if key not in params:
            raise CypherError(f"Missing parameter: ${key}")
        return params[key]
    return trim_quotes(t)
