"""SQLLogicTest conformance runner for the reference's own test files.

The reference ships its functional suite as DuckDB SQLLogicTests
(test/sql/faiss*.test — SURVEY.md §4); this module executes those files
verbatim against this engine's SQL tier + Python API, proving the
golden-value and error-message parity on the reference's own artifacts
rather than transcriptions.

Scope: a focused evaluator for exactly the statement shapes those files
use — CALL faiss_* with subquery/VALUES/literal args, CREATE TABLE [AS
SELECT]/INSERT, CSV sources with DuckDB's headerless column0..columnN
naming, list_value(), UNNEST(faiss_*(...)[, recursive:=true]) with struct
field access, WITH CTEs, JOIN USING, WHERE comparisons, and round().
Anything outside that raises, so silent false-passes are impossible.

Usage:
    from duckdb_faiss_ext_tpu.sql.logictest import run_file
    results = run_file("/root/reference/test/sql/faiss.test",
                       root="/root/reference/test/sql")
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from .. import api
from ..catalog import Catalog
from ..errors import InvalidInputError
from .engine import Database
from .dispatch import _parse_literal as _dispatch_literal
from .dispatch import _split_args


class UnsupportedStatement(Exception):
    """Raised when a statement/expression is outside the runner's grammar.
    Never counted as an engine error — a statement_error block that trips
    this is a runner bug, not a pass."""


def _parse_literal(tok):
    """dispatch's literal parser plus DuckDB bracket-list vectors."""
    tok = tok.strip()
    if tok.startswith("[") and tok.endswith("]"):
        return [float(v) for v in tok[1:-1].split(",") if v.strip()]
    return _dispatch_literal(tok)

# ---------------------------------------------------------------------------
# sqllogictest file parsing


@dataclass
class Block:
    kind: str                 # "statement_ok" | "statement_error" | "query"
    sql: str
    expected: list[str] = field(default_factory=list)
    line: int = 0


def parse_file(path: str) -> list[Block]:
    lines = open(path).read().splitlines()
    blocks: list[Block] = []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#") or line.startswith("require"):
            i += 1
            continue
        start = i
        if line.startswith("statement"):
            kind = ("statement_error" if "error" in line
                    else "statement_ok")
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() \
                    and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            expected = []
            if i < len(lines) and lines[i].strip() == "----":
                i += 1
                while i < len(lines) and lines[i].strip():
                    expected.append(lines[i].rstrip())
                    i += 1
            blocks.append(Block(kind, "\n".join(sql_lines).strip(),
                                expected, start + 1))
        elif line.startswith("query"):
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() \
                    and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            if i >= len(lines) or lines[i].strip() != "----":
                raise UnsupportedStatement(
                    f"{path}:{start + 1}: query block without ---- "
                    f"separator")
            i += 1  # skip ----
            expected = []
            while i < len(lines) and lines[i].strip():
                expected.append(lines[i].rstrip())
                i += 1
            blocks.append(Block("query", "\n".join(sql_lines).strip(),
                                expected, start + 1))
        else:
            raise UnsupportedStatement(
                f"{path}:{i + 1}: unsupported sqllogictest line: {line}")
    return blocks


# ---------------------------------------------------------------------------
# mini SQL evaluation (exactly the reference test files' shapes)

_LIST_VALUE_RE = re.compile(r"list_value\(([^()]*)\)", re.IGNORECASE)
_CSV_RE = re.compile(r"^'(.+\.csv)'$")
_ROUND_RE = re.compile(r"^round\((\w+)\s*,\s*(\d+)\)$", re.IGNORECASE)
_UNNEST_RE = re.compile(
    r"^UNNEST\(\s*(FAISS_\w+)\s*\((.*)\)\s*"
    r"(?:,\s*recursive\s*:=\s*true\s*)?\)\s*(?:\.(\w+))?\s*(\w+)?$",
    re.IGNORECASE | re.DOTALL)
_VALUES_RE = re.compile(
    r"^\(\s*VALUES\s*\((.*)\)\s*\)\s*as\s+(\w+)\s*\(([^)]*)\)$",
    re.IGNORECASE | re.DOTALL)
_WHERE_RE = re.compile(r"^(\w+)\s*(>=|<=|==|=|>|<|!=)\s*(-?[\d.]+)$")


class Table:
    """Ordered columnar relation; cells are numpy arrays or object arrays
    (vector cells hold np.float32 rows)."""

    def __init__(self, cols: dict):
        self.cols = dict(cols)

    @property
    def nrows(self) -> int:
        return len(next(iter(self.cols.values()))) if self.cols else 0

    def rows(self):
        names = list(self.cols)
        for i in range(self.nrows):
            yield [self.cols[n][i] for n in names]


class Runner:
    def __init__(self, root: str):
        self.root = root
        self.catalog = Catalog()
        self.db = Database()
        self.tables: dict[str, Table] = {}

    # -- table sources ------------------------------------------------------
    def _load_csv(self, relpath: str) -> Table:
        import os

        path = relpath
        bases = (self.root, os.path.dirname(self.root),
                 os.path.join(self.root, "..", ".."))
        candidates = [os.path.join(b, relpath) for b in bases] + [
            os.path.join(b, os.path.basename(relpath)) for b in bases]
        for cand in candidates:
            if os.path.exists(cand):
                path = cand
                break
        data = np.genfromtxt(path, delimiter=",", dtype=np.float64)
        if data.ndim == 1:
            data = data[None, :]
        # DuckDB names headerless CSV columns column0..columnN.
        return Table({f"column{j}": data[:, j].copy()
                      for j in range(data.shape[1])})

    def _register(self, name: str, table: Table) -> None:
        self.tables[name] = table
        # Numeric scalar columns feed the filter engine (search_filter).
        plain = {k: v for k, v in table.cols.items()
                 if isinstance(v, np.ndarray) and v.ndim == 1
                 and v.dtype != object}
        if plain:
            self.db.register(name, plain)

    def _source(self, tok: str) -> Table:
        tok = tok.strip()
        m = _CSV_RE.match(tok)
        if m:
            return self._load_csv(m.group(1))
        m = _VALUES_RE.match(tok)
        if m:
            if "),(" in m.group(1).replace(" ", ""):
                raise UnsupportedStatement(
                    f"multi-row VALUES is not supported: {tok[:80]}")
            vals = _split_args(m.group(1))
            names = [c.strip() for c in m.group(3).split(",")]
            if len(vals) != len(names):
                raise UnsupportedStatement(
                    f"VALUES arity {len(vals)} != columns {len(names)}")
            cols = {}
            for name, v in zip(names, vals):
                lit = _parse_literal(v.strip())
                if isinstance(lit, list):
                    arr = np.empty((1,), object)
                    arr[0] = np.asarray(lit, np.float32)
                    cols[name] = arr
                else:
                    cols[name] = np.asarray([lit])
            return Table(cols)
        if tok.startswith("(") and tok.endswith(")"):
            return self.eval_select(tok[1:-1].strip(), {})
        if tok in self.tables:
            return self.tables[tok]
        raise UnsupportedStatement(f"unknown table source: {tok}")

    # -- faiss function expressions ------------------------------------------
    def _faiss_call(self, fn: str, argstr: str, env_table: Table | None,
                    fieldname: str | None) -> Table:
        """Evaluate UNNEST(FAISS_SEARCH*(...)) over the rows of env_table.
        ``recursive:=true`` and plain struct UNNEST both surface the three
        (rank, label, distance) columns, so the flag is dropped here."""
        args = [a for a in _split_args(argstr)
                if not re.match(r"recursive\s*:=", a.strip(), re.IGNORECASE)]
        name = _parse_literal(args[0].strip())
        k = int(_parse_literal(args[1].strip()))
        qtok = args[2].strip()
        queries = self._vector_expr(qtok, env_table)
        fn = fn.lower()
        if fn == "faiss_search":
            res = api.faiss_search(name, k, queries, catalog=self.catalog)
        elif fn in ("faiss_search_filter", "faiss_search_filter_set"):
            filt = _parse_literal(args[3].strip())
            idsel = _parse_literal(args[4].strip())
            tab = _parse_literal(args[5].strip())
            call = (api.faiss_search_filter if fn == "faiss_search_filter"
                    else api.faiss_search_filter_set)
            res = call(name, k, queries, filt, idsel, tab,
                       catalog=self.catalog, database=self.db)
        else:
            raise UnsupportedStatement(f"unsupported faiss function {fn}")
        rank = np.tile(np.arange(k), queries.shape[0])
        label = res["label"].reshape(-1)
        dist = res["distance"].reshape(-1)
        if fieldname:
            return Table({fieldname: {"rank": rank, "label": label,
                                      "distance": dist}[fieldname]})
        return Table({"rank": rank, "label": label, "distance": dist})

    def _vector_expr(self, tok: str, env: Table | None) -> np.ndarray:
        tok = tok.strip()
        if tok.startswith("["):
            return np.asarray(_parse_literal(tok), np.float32)[None, :]
        m = _LIST_VALUE_RE.match(tok)
        if m and env is not None:
            cols = [c.strip() for c in m.group(1).split(",")]
            return np.stack([np.asarray(env.cols[c], np.float32)
                             for c in cols], axis=1)
        if env is not None and tok in env.cols:
            col = env.cols[tok]
            if col.dtype == object:
                return np.stack([np.asarray(v, np.float32) for v in col])
            return np.asarray(col, np.float32)
        raise UnsupportedStatement(f"unsupported vector expression: {tok}")

    # -- SELECT evaluation ----------------------------------------------------
    def eval_select(self, sql: str, ctes: dict) -> Table:
        sql = sql.strip().rstrip(";").strip()
        m = re.match(r"^WITH\s+(.*)$", sql, re.IGNORECASE | re.DOTALL)
        if m:
            rest = m.group(1)
            ctes = dict(ctes)
            # CTE list: name AS ( ... ), name2 AS ( ... ) <body>
            while True:
                cm = re.match(r"^\s*(\w+)\s+AS\s*\(", rest,
                              re.IGNORECASE | re.DOTALL)
                if not cm:
                    break
                depth, j = 0, cm.end() - 1
                while j < len(rest):
                    if rest[j] == "(":
                        depth += 1
                    elif rest[j] == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                ctes[cm.group(1)] = self.eval_select(
                    rest[cm.end():j], ctes)
                rest = rest[j + 1:].lstrip()
                if rest.startswith(","):
                    rest = rest[1:]
                else:
                    break
            sql = rest.strip()
        m = re.match(
            r"^SELECT\s+(.*?)\s+FROM\s+(.+?)"
            r"(?:\s+JOIN\s+(\w+)\s+USING\s*\((\w+)\))?"
            r"(?:\s+WHERE\s+(.+?))?\s*$",
            sql, re.IGNORECASE | re.DOTALL)
        if not m:
            raise UnsupportedStatement(f"unsupported SELECT: {sql[:100]}")
        projs, src, join_tab, join_col, where = m.groups()

        # FROM source (CTE name, registered table, CSV, subquery, UNNEST)
        src = src.strip()
        um = _UNNEST_RE.match(src)
        if um:
            base = self._faiss_call(um.group(1), um.group(2), None,
                                    um.group(3))
        elif src in ctes:
            base = ctes[src]
        else:
            base = self._source(src)

        if join_tab:
            right = ctes.get(join_tab) or self.tables[join_tab]
            base = _join_using(base, right, join_col)
        if where:
            base = _apply_where(base, where.strip())
        return self._project(base, projs.strip(), ctes)

    def _project(self, base: Table, projs: str, ctes: dict) -> Table:
        if projs == "*":
            return base
        out: dict = {}
        for item in _split_args(projs):
            item = item.strip()
            um = _UNNEST_RE.match(item)
            if um:
                sub = self._faiss_call(um.group(1), um.group(2), base,
                                       um.group(3))
                alias = um.group(4)
                for cname, col in sub.cols.items():
                    out[alias or cname] = col
                continue
            rm = _ROUND_RE.match(item)
            if rm:
                col = np.asarray(out.get(rm.group(1),
                                         base.cols.get(rm.group(1))))
                out[rm.group(1)] = np.round(col.astype(np.float64),
                                            int(rm.group(2)))
                continue
            lm = _LIST_VALUE_RE.match(item)
            if lm:
                rest = item[lm.end():].strip()
                vec = self._vector_expr(item if not rest
                                        else item[: lm.end()], base)
                arr = np.empty((vec.shape[0],), object)
                for i in range(vec.shape[0]):
                    arr[i] = vec[i]
                out[rest or "list"] = arr
                continue
            parts = item.split()
            colname = parts[0]
            alias = parts[1] if len(parts) > 1 else colname
            if colname in base.cols:
                out[alias] = base.cols[colname]
            elif colname in out:
                out[alias] = out.pop(colname)
            else:
                raise UnsupportedStatement(
                    f"unsupported projection: {item}")
        return Table(out)

    # -- statements -----------------------------------------------------------
    def execute(self, sql: str):
        sql = sql.strip().rstrip(";").strip()
        low = sql.lower()
        if low.startswith("call"):
            return self._execute_call(sql)
        if low.startswith("create table"):
            return self._execute_create_table(sql)
        if low.startswith("insert into"):
            return self._execute_insert(sql)
        if low.startswith("select") or low.startswith("with"):
            return self.eval_select(sql, {})
        raise UnsupportedStatement(f"unsupported statement: {sql[:100]}")

    def _execute_call(self, sql: str):
        m = re.match(r"^CALL\s+(\w+)\s*\((.*)\)$", sql,
                     re.IGNORECASE | re.DOTALL)
        if not m:
            raise UnsupportedStatement(f"cannot parse CALL: {sql[:100]}")
        fn = m.group(1).lower()
        args = _split_args(m.group(2))
        named, pos = {}, []
        for a in args:
            a = a.strip()
            nm = re.match(r"^(\w+)\s*=\s*(.+)$", a, re.DOTALL)
            if nm and not a.startswith("(") and ":=" not in a:
                named[nm.group(1)] = _parse_literal(nm.group(2).strip())
            else:
                pos.append(a)
        if fn == "faiss_create":
            if len(pos) != 3:
                # Match sql/dispatch.py: extra positionals are an error,
                # not silently dropped.
                raise InvalidInputError(
                    "faiss_create takes 3 positional arguments; use "
                    "faiss_create_params for a parameter map")
            api.faiss_create(_parse_literal(pos[0]), int(pos[1]),
                             _parse_literal(pos[2]), catalog=self.catalog,
                             **named)
        elif fn == "faiss_create_params":
            params = _parse_literal(pos[3])
            api.faiss_create_params(_parse_literal(pos[0]), int(pos[1]),
                                    _parse_literal(pos[2]), params,
                                    catalog=self.catalog, **named)
        elif fn in ("faiss_add", "faiss_manual_train"):
            data = self._table_arg(pos[0])
            getattr(api, fn)(data, _parse_literal(pos[1]),
                             catalog=self.catalog)
        elif fn == "faiss_destroy":
            api.faiss_destroy(_parse_literal(pos[0]), catalog=self.catalog)
        elif fn == "faiss_save":
            api.faiss_save(_parse_literal(pos[0]), _parse_literal(pos[1]),
                           catalog=self.catalog)
        elif fn == "faiss_load":
            api.faiss_load(_parse_literal(pos[0]), _parse_literal(pos[1]),
                           catalog=self.catalog)
        else:
            raise UnsupportedStatement(f"unsupported CALL {fn}")

    def _table_arg(self, tok: str):
        """'(SELECT [id,] vectors FROM src)' → ndarray or (ids, ndarray)."""
        tab = self._source(tok) if not tok.strip().lower().startswith(
            "(select") else self.eval_select(tok.strip()[1:-1], {})
        cols = list(tab.cols)
        if len(cols) == 1:
            return self._vector_expr(cols[0], tab)
        if len(cols) == 2:
            ids = np.asarray(tab.cols[cols[0]], np.int64)
            return ids, self._vector_expr(cols[1], tab)
        raise InvalidInputError(
            "table argument must project 1 or 2 columns")

    def _execute_create_table(self, sql: str):
        m = re.match(
            r"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(.+)$",
            sql, re.IGNORECASE | re.DOTALL)
        if m:
            self._register(m.group(1), self.eval_select(m.group(2), {}))
            return
        m = re.match(
            r"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*)\)$",
            sql, re.IGNORECASE | re.DOTALL)
        if m:
            # Schema-only creation (faiss7): empty typed columns.
            cols = {}
            for coldef in _split_args(m.group(2)):
                cname = coldef.strip().split()[0]
                cols[cname] = np.empty((0,), object)
            self._register(m.group(1), Table(cols))
            return
        raise UnsupportedStatement(f"unsupported CREATE TABLE: {sql[:100]}")

    def _execute_insert(self, sql: str):
        m = re.match(
            r"^INSERT\s+INTO\s+(\w+)\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)$",
            sql, re.IGNORECASE | re.DOTALL)
        if not m:
            raise UnsupportedStatement(f"unsupported INSERT: {sql[:100]}")
        tab = self.tables[m.group(1)]
        names = [c.strip() for c in m.group(2).split(",")]
        vals = [_parse_literal(v.strip())
                for v in _split_args(m.group(3))]
        new = {}
        for cname, old in tab.cols.items():
            if cname in names:
                v = vals[names.index(cname)]
            else:
                v = None
            add = np.empty((1,), object)
            add[0] = v
            new[cname] = np.concatenate([np.asarray(old, object), add])
        # Re-register with numeric coercion where possible.
        coerced = {}
        for cname, col in new.items():
            try:
                coerced[cname] = col.astype(np.float64)
            except (TypeError, ValueError):
                coerced[cname] = col
        self._register(m.group(1), Table(coerced))


def _join_using(left: Table, right: Table, col: str) -> Table:
    """Inner JOIN ... USING(col): left-row order preserved, every matching
    right row emitted (the reference's faiss2 join shape)."""
    rvals = np.asarray(right.cols[col])
    out: dict = {c: [] for c in
                 [col] + [c for c in left.cols if c != col]
                 + [c for c in right.cols if c != col]}
    lcols = [c for c in left.cols if c != col]
    rcols = [c for c in right.cols if c != col]
    for i in range(left.nrows):
        key = left.cols[col][i]
        matches = np.nonzero(rvals == key)[0]
        for j in matches:
            out[col].append(key)
            for c in lcols:
                out[c].append(left.cols[c][i])
            for c in rcols:
                out[c].append(right.cols[c][j])

    def pack(vals):
        arr = np.empty((len(vals),), object)
        for i, v in enumerate(vals):
            arr[i] = v
        try:
            return np.asarray(vals, np.float64)
        except (TypeError, ValueError):
            return arr

    return Table({c: pack(v) for c, v in out.items()})


_WHERE_OPS = {
    ">": np.greater, "<": np.less, ">=": np.greater_equal,
    "<=": np.less_equal, "=": np.equal, "==": np.equal,
    "!=": np.not_equal,
}


def _apply_where(table: Table, cond: str) -> Table:
    m = _WHERE_RE.match(cond)
    if not m:
        raise UnsupportedStatement(f"unsupported WHERE: {cond}")
    colname, op, rhs = m.groups()
    mask = _WHERE_OPS[op](np.asarray(table.cols[colname], np.float64),
                          float(rhs))
    return Table({c: v[mask] for c, v in table.cols.items()})


# ---------------------------------------------------------------------------
# result comparison & drivers


def _canon_cell(tok: str):
    tok = tok.strip()
    if tok.startswith("[") and tok.endswith("]"):
        return tuple(float(v) for v in tok[1:-1].split(",") if v.strip())
    try:
        return float(tok)
    except ValueError:
        return tok


def _canon_row(line: str):
    # Tabs separate cells; list cells contain ", " — split on tabs first,
    # fall back to whitespace for single-space-separated golden files.
    parts = [p for p in re.split(r"\t+", line.strip()) if p.strip()]
    if len(parts) == 1 and "[" not in line:
        parts = line.split()
    return [_canon_cell(p) for p in parts]


def _format_value(v) -> str:
    if isinstance(v, (np.floating, float)):
        return repr(float(np.float32(v)))
    if isinstance(v, np.ndarray):
        return "[" + ", ".join(repr(float(np.float32(x))) for x in v) + "]"
    return str(v)


def _cells_match(a, b, rtol=2e-5, atol=2e-5) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            _cells_match(x, y, rtol, atol) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        return bool(np.isclose(a, b, rtol=rtol, atol=atol))
    return a == b


def _toplevel_join(sql: str) -> bool:
    """True when the OUTER select is a join (hash-join output order is a
    DuckDB artifact); JOINs buried in CTEs/subqueries keep strict order."""
    depth = 0
    out = []
    for ch in sql:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            out.append(ch)
    return bool(re.search(r"\bJOIN\b", "".join(out), re.IGNORECASE))


def compare_rows(actual: list[list], expected_lines: list[str],
                 allow_unordered: bool = False) -> str | None:
    expected = [_canon_row(line) for line in expected_lines]
    if len(actual) != len(expected):
        return f"row count {len(actual)} != expected {len(expected)}"
    arows = [[_canon_cell(_format_value(v)) for v in row] for row in actual]

    def rows_equal(a, b):
        return all(len(x) == len(y) and all(
            _cells_match(u, v) for u, v in zip(x, y))
            for x, y in zip(a, b))

    if rows_equal(arows, expected):
        return None
    if allow_unordered:
        # JOIN goldens capture DuckDB's hash-join output order, an engine
        # artifact (sqllogictest would use rowsort); every other block is
        # compared strictly so ordering regressions fail.
        key = repr
        if rows_equal(sorted(arows, key=key), sorted(expected, key=key)):
            return None
    for i, (arow, erow) in enumerate(zip(arows, expected)):
        if not rows_equal([arow], [erow]):
            return f"row {i}: got {arow}, expected {erow}"
    return "row mismatch"


def run_file(path: str, root: str) -> list[tuple[int, str, str | None]]:
    """Execute one .test file; returns [(line, kind, failure-or-None)]."""
    runner = Runner(root)
    results = []
    for block in parse_file(path):
        failure = None
        if block.kind == "statement_ok":
            try:
                runner.execute(block.sql)
            except Exception as e:  # noqa: BLE001 — reported as failure
                failure = f"unexpected error: {type(e).__name__}: {e}"
        elif block.kind == "statement_error":
            try:
                runner.execute(block.sql)
                failure = "expected an error, statement succeeded"
            except UnsupportedStatement as e:
                # The runner could not even evaluate the statement — the
                # engine was never exercised, so this cannot count as the
                # expected error.
                failure = f"runner cannot evaluate statement: {e}"
            except Exception as e:  # noqa: BLE001
                if block.expected:
                    want = "\n".join(block.expected)
                    # DuckDB prefixes "Invalid Input Error: "; our message
                    # is the payload.
                    want_payload = want.split(": ", 1)[-1]
                    if want_payload not in str(e):
                        failure = (f"error message mismatch: got {e!s:.120}, "
                                   f"expected {want_payload:.120}")
        else:  # query
            try:
                table = runner.execute(block.sql)
                failure = compare_rows(
                    list(table.rows()), block.expected,
                    allow_unordered=_toplevel_join(block.sql))
            except Exception as e:  # noqa: BLE001
                failure = f"unexpected error: {type(e).__name__}: {e}"
        results.append((block.line, block.kind, failure))
    return results
