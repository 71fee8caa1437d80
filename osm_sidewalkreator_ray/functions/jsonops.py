"""JSON-string column operators.

Web-corpus tables carry structured metadata as JSON strings (the
testdata's ``events.props``; Common-Crawl WARC/WET headers in the
wild). Two extraction paths, one semantics:

- ``regex`` fast path — TOP-LEVEL SCALAR keys only: one compiled
  pattern per key evaluated through pandas' C string engine
  (``Series.str.extract``), no per-row Python. Safe because a
  top-level scalar in a flat object cannot be shadowed by nesting —
  the engine REFUSES the fast path (falls back to ``json``) when a
  batch contains ``{``/``[`` after the key's colon, so a nested value
  never silently string-matches.
- ``json`` general path — stdlib ``json.loads`` per row (the parser
  is C; only the loop is Python). Handles nesting via dotted paths
  ("a.b.c").

Both paths agree with DuckDB's ``json_extract`` on the supported
shapes (``tests/test_jsonops.py``); missing keys and malformed
documents yield NULL, never an exception (corpus JSON is dirty by
definition). Reference parity: the reference plugin has no JSON
surface — this extends the webtext family (SURVEY.md §2.9's
beyond-reference operators).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

_TYPES = {"int64": "Int64", "float64": "float64", "string": "string",
          "bool": "boolean"}

# a top-level scalar value: string (no escapes needed for the fast
# path to claim it — any backslash falls back), number, bool, null
_SCALAR = (r'"(?:[^"\\]*)"|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?'
           r'|true|false|null')


def _key_pattern(key: str) -> re.Pattern:
    return re.compile(r'"%s"\s*:\s*(%s)' % (re.escape(key), _SCALAR))


def _unquote(tok: pd.Series) -> pd.Series:
    quoted = tok.str.startswith('"').fillna(False)
    out = tok.copy()
    # only the UNQUOTED null token is JSON null; deciding after
    # unquoting also nulled the legitimate string value "null"
    # (divergence from the json path and from DuckDB)
    out[~quoted & (tok == "null")] = None
    out[quoted] = tok[quoted].str.slice(1, -1)
    return out


def _cast(s: pd.Series, typ: str) -> pd.Series:
    if typ == "bool":
        m = s.map({"true": True, "false": False})
        return m.astype("boolean")
    if typ in ("int64", "float64"):
        num = pd.to_numeric(s, errors="coerce")
        return num.astype(_TYPES[typ])
    return s.astype("string")


def extract_batch(docs: pd.Series, fields: dict[str, str],
                  parser: str = "auto") -> pd.DataFrame:
    """Extract ``fields`` (dotted path -> type name in int64 / float64
    / string / bool) from a Series of JSON strings. ``parser``:
    'regex' (top-level scalars, vectorized), 'json' (general),
    'auto' = regex when every path is top-level and no batch value
    needs escape handling, else json."""
    if parser not in ("auto", "regex", "json"):
        raise ValueError(f"parser={parser!r}")
    top_level = all("." not in p for p in fields)
    if parser == "regex" and not top_level:
        raise ValueError("regex parser supports top-level keys only")
    # the fast path's "top-level key" claim is only sound on FLAT
    # objects: a nested {"a": {"k": 5}} would string-match "k" at the
    # wrong level. Flatness is one vectorized scan — any brace/bracket
    # past the opening one sends the batch to the general parser.
    flat = not bool(docs.str.slice(1).str.contains(
        r"[{\[]", regex=True, na=False).any())
    use_regex = (parser == "regex"
                 or (parser == "auto" and top_level and flat))
    if parser == "regex" and not flat:
        raise ValueError("regex parser requires flat objects")
    out = {}
    if use_regex:
        ok = True
        cols = {}
        for path, typ in fields.items():
            tok = docs.str.extract(_key_pattern(path), expand=False)
            # refuse the fast path if any present key is followed by
            # a non-scalar (nesting/arrays) or an escaped string —
            # the general parser owns those
            has_key = docs.str.contains('"%s"' % re.escape(path),
                                        regex=False, na=False)
            if bool((has_key & tok.isna()).any()) or \
                    bool(tok.str.contains(r"\\", na=False).any()):
                ok = False
                break
            cols[path] = _cast(_unquote(tok), typ)
        if ok:
            for path, typ in fields.items():
                out[path.replace(".", "_")] = cols[path]
            return pd.DataFrame(out, index=docs.index)
        if parser == "regex":
            raise ValueError("regex parser hit a nested/escaped value")
    # general path
    parts = [p.split(".") for p in fields]
    vals: list[list] = [[] for _ in fields]
    for doc in docs:
        try:
            obj = json.loads(doc) if isinstance(doc, str) else None
        except (ValueError, TypeError):
            obj = None
        for i, path in enumerate(parts):
            cur = obj
            for seg in path:
                cur = cur.get(seg) if isinstance(cur, dict) else None
            vals[i].append(cur if not isinstance(cur, (dict, list))
                           else None)
    for i, (path, typ) in enumerate(fields.items()):
        s = pd.Series(vals[i], index=docs.index, dtype="object")
        if typ == "bool":
            # non-bool scalars become NA (same semantics as the regex
            # path's _cast); astype('boolean') on them would raise and
            # one dirty document would kill the whole task
            out[path.replace(".", "_")] = s.map(
                lambda v: v if isinstance(v, bool) else None) \
                .astype("boolean")
        elif typ in ("int64", "float64"):
            out[path.replace(".", "_")] = pd.to_numeric(
                s, errors="coerce").astype(_TYPES[typ])
        else:
            # JSON spelling for non-string scalars (true, not True) —
            # matches json_extract_string and the regex path
            s = s.map(lambda v: "true" if v is True
                      else "false" if v is False else v)
            out[path.replace(".", "_")] = s.astype("string")
    return pd.DataFrame(out, index=docs.index)


def json_extract_ds(ds, col: str, fields: dict[str, str],
                    parser: str = "auto", keep_doc: bool = False):
    """Dataset form: append one typed column per field (dotted path ->
    ``a_b_c``); the JSON column itself is DROPPED unless
    ``keep_doc`` — at corpus scale the parsed columns are the point
    and the raw string is the widest thing in the row."""
    def f(b: pd.DataFrame) -> pd.DataFrame:
        ex = extract_batch(b[col], fields, parser=parser)
        base = b if keep_doc else b.drop(columns=[col])
        return pd.concat([base.reset_index(drop=True),
                          ex.reset_index(drop=True)], axis=1)

    return ds.map_batches(f, batch_format="pandas")


def json_profile_ds(ds, col: str, max_depth: int = 3,
                    num_buckets: int = 16):
    """Corpus-wide JSON shape profile: one row per (path, json_type)
    with document counts — the discovery pass you run BEFORE wiring
    typed extraction. Fixed-size per-batch partials (a dict of
    (path, type) -> count, bounded by the schema vocabulary, never
    row count) combined through one slim groupby."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[tuple[str, str], int] = {}

        def walk(obj, prefix: str, depth: int):
            t = ("object" if isinstance(obj, dict)
                 else "array" if isinstance(obj, list)
                 else "string" if isinstance(obj, str)
                 else "bool" if isinstance(obj, bool)
                 else "number" if isinstance(obj, (int, float))
                 else "null")
            key = (prefix or "$", t)
            counts[key] = counts.get(key, 0) + 1
            if isinstance(obj, dict) and depth < max_depth:
                for k, v in obj.items():
                    walk(v, f"{prefix}.{k}" if prefix else k,
                         depth + 1)

        for doc in b[col]:
            try:
                walk(json.loads(doc), "", 0)
            except (ValueError, TypeError):
                counts[("$", "malformed")] = counts.get(
                    ("$", "malformed"), 0) + 1
        if not counts:
            return pd.DataFrame({"path": pd.Series([], dtype="string"),
                                 "json_type": pd.Series([],
                                                        dtype="string"),
                                 "n_docs": pd.Series([],
                                                     dtype="int64"),
                                 "__b": pd.Series([], dtype="int64")})
        paths = [k[0] for k in counts]
        return pd.DataFrame({
            "path": pd.Series(paths, dtype="string"),
            "json_type": pd.Series([k[1] for k in counts],
                                   dtype="string"),
            "n_docs": np.fromiter(counts.values(), dtype=np.int64),
            "__b": (pd.util.hash_array(np.asarray(paths, dtype=object))
                    % num_buckets).astype(np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["path", "json_type"], as_index=False)
               ["n_docs"].sum())
        return out

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("__b").map_groups(combine, batch_format="pandas"))
