"""Static per-query source fingerprints for the code-aware verification
rotation.

Round 10 exposed a blind spot in the driver-window rotation: it ordered
queries by least-recently-verified ROUND, so a query whose implementing
operator was just rewritten (``sketches.py`` → ``user_heavy_hitters_cms``)
could sort LAST — the riskiest queries (changed code) were the least
likely to re-verify. This module closes that hole by fingerprinting each
registered query's implementing SOURCE, statically and at DEF
granularity across modules:

- the registry ENTRY expression (``(fn, SQL)`` tuple source),
- the transitive closure of definitions the entry reaches — same-module
  helpers, and through ``M.attr`` / ``from mod import name`` references
  the specific defs in other package modules, recursively (so rewriting
  ``cms_heavy_hitters`` in ``sketches.py`` bumps exactly the CMS
  queries, while ADDING an unrelated def to a shared module bumps
  nothing),
- whole-file content only as a FALLBACK, when a module binding is used
  in a way static analysis can't follow (bare module reference passed
  around, unresolvable attribute) — over-trigger rather than miss.

Everything is resolved from FILES via ``ast`` (never ``sys.modules``),
so the same code can fingerprint a historical git tree (``git archive``
into a temp dir — ``tools/refresh_fingerprints.py``) to recover the
fingerprint each query had at its last green driver row. The rotation in
``__spark_entry__`` then sorts current-fp ≠ last-green-fp queries FIRST,
ahead of the never-verified (VERDICT r10 §Next #2).

No Spark dependency: importable by repo tools and the driver entry alike.
"""

from __future__ import annotations

import ast
import glob
import hashlib
import json
import os

PKG = "consent_based_conversion_adjustments_spark"

#: registry files, relative to the package root's PARENT (= repo root)
REGISTRY_RELPATHS = (
    f"{PKG}/plans/cocoa_queries.py",
    f"{PKG}/plans/relational.py",
    f"{PKG}/plans/data_queries.py",
    f"{PKG}/plans/corpus_queries.py",
)


def last_green_rounds(record_dir: str) -> dict[str, int]:
    """Map query name -> most recent round whose CORRECTNESS record shows
    a PASS (hash/rows/schema all green, or the rows-only ``no_oracle``
    mode). Failures do not count — a failed query must re-sort to the
    front. Shared by the driver entry's rotation and the fingerprint
    refresher."""
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(record_dir, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")])
            records = json.load(open(path))
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, rec in records.items():
            if not isinstance(rec, dict):
                seen[name] = max(seen.get(name, 0), rnd)
                continue
            failed = (
                rec.get("hash_match") is False
                or rec.get("rows_match") is False
                or rec.get("schema_match") is False
                or rec.get("err") not in (None, "no_oracle")
            )
            if not failed:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def _segment(lines: list[str], node: ast.AST) -> str:
    """Line-sliced source segment (hash material only — line granularity
    is enough, and ast.get_source_segment re-splits the whole 4k-line
    registry source on EVERY call, which made it 90% of runtime).

    Decorator lines are part of the segment: for FunctionDef/ClassDef,
    ``node.lineno`` is the ``def``/``class`` line, which would exclude
    decorators — so editing a decorator argument (a cache size, a retry
    count) would change behavior without bumping the fingerprint
    (ADVICE r11). Start the slice at the first decorator instead."""
    try:
        start = node.lineno
        for dec in getattr(node, "decorator_list", None) or ():
            start = min(start, dec.lineno)
        return "".join(lines[start - 1 : node.end_lineno])
    except (AttributeError, TypeError):
        return ""


class _Tree:
    """Parsed, cached view of one package tree (live repo or an archived
    historical round)."""

    def __init__(self, root: str):
        self.root = root
        self._src: dict[str, str] = {}
        self._lines: dict[str, list[str]] = {}
        self._ast: dict[str, ast.Module | None] = {}
        self._fhash: dict[str, str] = {}
        self._closure: dict[str, frozenset[str]] = {}
        self._bindings: dict[str, dict[str, tuple]] = {}

    # -- raw file access ----------------------------------------------------

    def src(self, relpath: str) -> str:
        if relpath not in self._src:
            with open(os.path.join(self.root, relpath), encoding="utf-8") as fh:
                self._src[relpath] = fh.read()
        return self._src[relpath]

    def lines(self, relpath: str) -> list[str]:
        if relpath not in self._lines:
            self._lines[relpath] = self.src(relpath).splitlines(keepends=True)
        return self._lines[relpath]

    def tree(self, relpath: str) -> ast.Module | None:
        if relpath not in self._ast:
            try:
                self._ast[relpath] = ast.parse(self.src(relpath))
            except (OSError, SyntaxError):
                self._ast[relpath] = None
        return self._ast[relpath]

    def file_hash(self, relpath: str) -> str:
        if relpath not in self._fhash:
            try:
                h = hashlib.sha256(self.src(relpath).encode()).hexdigest()
            except OSError:
                h = "missing"
            self._fhash[relpath] = h
        return self._fhash[relpath]

    # -- import resolution ---------------------------------------------------

    def _resolve_from(
        self, cur_relpath: str, node: ast.ImportFrom
    ) -> dict[str, tuple]:
        """Bindings created by one ImportFrom: alias -> ("modalias", file)
        when the imported name IS a package module, ("member", file, name)
        when it is a name inside a package module, or ("ext",) otherwise."""
        if node.level > 0:
            parts = os.path.dirname(cur_relpath).split("/")
            if node.level - 1 >= len(parts):
                return {}
            base_parts = parts[: len(parts) - (node.level - 1)]
            dotted = "/".join(base_parts)
            if node.module:
                dotted += "/" + node.module.replace(".", "/")
        else:
            dotted = (node.module or "").replace(".", "/")
            if not (dotted == PKG or dotted.startswith(PKG + "/")):
                return {alias.asname or alias.name: ("ext",) for alias in node.names}
        out: dict[str, tuple] = {}
        for alias in node.names:
            bound = alias.asname or alias.name
            mod_file = None
            for cand in (
                f"{dotted}/{alias.name}.py",
                f"{dotted}/{alias.name}/__init__.py",
            ):
                if cand.startswith(PKG + "/") and os.path.isfile(
                    os.path.join(self.root, cand)
                ):
                    mod_file = cand
                    break
            if mod_file is not None:
                out[bound] = ("modalias", mod_file)
                continue
            for cand in (f"{dotted}.py", f"{dotted}/__init__.py"):
                if cand.startswith(PKG + "/") and os.path.isfile(
                    os.path.join(self.root, cand)
                ):
                    out[bound] = ("member", cand, alias.name)
                    break
            else:
                out[bound] = ("ext",)
        return out

    def _resolve_import(self, node: ast.Import) -> dict[str, tuple]:
        out: dict[str, tuple] = {}
        for alias in node.names:
            dotted = alias.name.replace(".", "/")
            if not (dotted == PKG or dotted.startswith(PKG + "/")):
                out[alias.asname or alias.name.split(".")[0]] = ("ext",)
                continue
            for cand in (f"{dotted}.py", f"{dotted}/__init__.py"):
                if os.path.isfile(os.path.join(self.root, cand)):
                    bound = alias.asname or alias.name.split(".")[0]
                    out[bound] = ("modalias", cand)
                    break
        return out

    def import_files(self, cur_relpath: str, node: ast.AST) -> list[str]:
        """All package files an Import/ImportFrom touches (file-level)."""
        if isinstance(node, ast.ImportFrom):
            binds = self._resolve_from(cur_relpath, node)
        elif isinstance(node, ast.Import):
            binds = self._resolve_import(node)
        else:
            return []
        out = []
        for b in binds.values():
            if b[0] in ("modalias", "member"):
                out.append(b[1])
        return out

    def module_closure(self, relpath: str) -> frozenset[str]:
        """All package-internal files reachable from ``relpath`` through
        import statements (the FILE-LEVEL fallback closure)."""
        if relpath in self._closure:
            return self._closure[relpath]
        seen: set[str] = set()
        stack = [relpath]
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            t = self.tree(cur)
            if t is None:
                continue
            for node in ast.walk(t):
                if isinstance(node, (ast.Import, ast.ImportFrom)):
                    for f in self.import_files(cur, node):
                        if f not in seen:
                            stack.append(f)
        out = frozenset(seen)
        self._closure[relpath] = out
        return out

    # -- top-level bindings ----------------------------------------------------

    def bindings(self, relpath: str) -> dict[str, tuple]:
        """Top-level name bindings of a module:
        name -> ("def", seg_hash, node) | ("modalias", file)
              | ("member", file, name) | ("ext",)"""
        if relpath in self._bindings:
            return self._bindings[relpath]
        out: dict[str, tuple] = {}
        mod = self.tree(relpath)
        if mod is not None:
            lines = self.lines(relpath)
            for node in mod.body:
                if isinstance(
                    node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
                ):
                    out[node.name] = ("def", _segment(lines, node), node)
                elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                    targets = (
                        node.targets
                        if isinstance(node, ast.Assign)
                        else [node.target]
                    )
                    seg = _segment(lines, node)
                    for t in targets:
                        if isinstance(t, ast.Name):
                            out[t.id] = ("def", seg, node)
                        elif isinstance(t, (ast.Tuple, ast.List)):
                            for el in t.elts:
                                if isinstance(el, ast.Name):
                                    out[el.id] = ("def", seg, node)
                elif isinstance(node, ast.ImportFrom):
                    out.update(self._resolve_from(relpath, node))
                elif isinstance(node, ast.Import):
                    out.update(self._resolve_import(node))
        self._bindings[relpath] = out
        return out

    # -- def-level reference analysis -----------------------------------------

    def def_detail(self, relpath: str, node: ast.AST) -> tuple:
        """Analyze one AST node in module ``relpath``:
        returns (names, attr_uses, bare_mod_ok, import_files) where
        - names: every Name id referenced,
        - attr_uses: {alias: set(attrs)} for Attribute accesses rooted at
          a Name,
        - bare_names: Name ids that appear OUTSIDE an attribute root
          position (forces file-level fallback for module aliases),
        - import_files: package files imported inside the node."""
        names: set[str] = set()
        attr_uses: dict[str, set[str]] = {}
        attr_root_counts: dict[str, int] = {}
        name_counts: dict[str, int] = {}
        imp_files: list[str] = []
        for n in ast.walk(node):
            if isinstance(n, ast.Name):
                names.add(n.id)
                name_counts[n.id] = name_counts.get(n.id, 0) + 1
            elif isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
                root = n.value.id
                attr_uses.setdefault(root, set()).add(n.attr)
                attr_root_counts[root] = attr_root_counts.get(root, 0) + 1
            elif isinstance(n, (ast.Import, ast.ImportFrom)):
                imp_files.extend(self.import_files(relpath, n))
        bare_names = {
            nm
            for nm, c in name_counts.items()
            if c > attr_root_counts.get(nm, 0)
        }
        return names, attr_uses, bare_names, imp_files


def _entry_material(
    tree: _Tree, relpath: str, seed_node: ast.AST
) -> tuple[list[tuple[str, str, str]], set[str]]:
    """Def-level transitive closure from a seed AST node in ``relpath``.

    Returns (defs, fallback_files):
    - defs: sorted (module, name, sha256-of-def-segment) triples for every
      definition the seed reaches (cross-module, def granularity),
    - fallback_files: package files included whole (bare-module uses,
      unresolved attributes, dynamic shapes) — over-trigger, never miss.
    """
    defs: dict[tuple[str, str], str] = {}
    fallback: set[str] = set()
    visited: set[tuple[str, str]] = set()

    def visit_item(mod: str, name: str, *, member: bool = False) -> None:
        if (mod, name) in visited:
            return
        visited.add((mod, name))
        b = tree.bindings(mod).get(name)
        if b is None:
            if member:
                # a from-import whose target name has no top-level def in
                # the target module (__init__ re-export, __all__ tricks):
                # never drop silently — take the whole file + its closure
                fallback.update(tree.module_closure(mod))
            # else: builtin, parameter, or local variable — nothing to add
            return
        if b[0] == "modalias":
            # a bare module binding reached as a VALUE — cannot follow
            # statically; take the whole file (and its import closure)
            fallback.update(tree.module_closure(b[1]))
            return
        if b[0] == "member":
            visit_item(b[1], b[2], member=True)
            return
        if b[0] == "ext":
            return
        _, seg, node = b
        defs[(mod, name)] = hashlib.sha256(seg.encode()).hexdigest()
        visit_node(mod, node)

    def visit_node(mod: str, node: ast.AST) -> None:
        names, attr_uses, bare_names, imp_files = tree.def_detail(mod, node)
        binds = tree.bindings(mod)
        # local imports inside the node create their own bindings; treat
        # them like module-level ones for resolution below
        local_binds: dict[str, tuple] = {}
        for n in ast.walk(node):
            if isinstance(n, ast.ImportFrom):
                local_binds.update(tree._resolve_from(mod, n))
            elif isinstance(n, ast.Import):
                local_binds.update(tree._resolve_import(n))
        eff = dict(binds)
        eff.update(local_binds)
        for nm in sorted(names):
            b = eff.get(nm)
            if b is None:
                continue
            if b[0] == "modalias":
                target_file = b[1]
                if nm in bare_names:
                    # module used as a value (passed/stored) — file fallback
                    fallback.update(tree.module_closure(target_file))
                    continue
                tb = tree.bindings(target_file)
                for attr in sorted(attr_uses.get(nm, ())):
                    if attr in tb:
                        visit_item(target_file, attr)
                    else:
                        # attribute we can't resolve (re-export, dynamic)
                        fallback.update(tree.module_closure(target_file))
            elif b[0] == "member":
                visit_item(b[1], b[2], member=True)
            elif b[0] == "def":
                visit_item(mod, nm)
            # ext: ignore

    # the seed: resolve its names against the registry module's bindings
    names, attr_uses, bare_names, _ = tree.def_detail(relpath, seed_node)
    binds = tree.bindings(relpath)
    for nm in sorted(names):
        b = binds.get(nm)
        if b is None:
            continue
        if b[0] == "def":
            visit_item(relpath, nm)
        elif b[0] == "member":
            visit_item(b[1], b[2], member=True)
        elif b[0] == "modalias":
            if nm in bare_names:
                fallback.update(tree.module_closure(b[1]))
            else:
                tb = tree.bindings(b[1])
                for attr in sorted(attr_uses.get(nm, ())):
                    if attr in tb:
                        visit_item(b[1], attr)
                    else:
                        fallback.update(tree.module_closure(b[1]))
    out = sorted((m, n, h) for (m, n), h in defs.items())
    return out, fallback


def _registry_fingerprints(tree: _Tree, relpath: str) -> dict[str, str]:
    src = tree.src(relpath)
    lines = tree.lines(relpath)
    mod = tree.tree(relpath)
    if mod is None:
        return {}

    qdict = None
    for node in mod.body:
        tgt = None
        if isinstance(node, ast.Assign) and node.targets:
            tgt = node.targets[0]
        elif isinstance(node, ast.AnnAssign):
            tgt = node.target
        if isinstance(tgt, ast.Name) and tgt.id == "QUERIES":
            if isinstance(node.value, ast.Dict):
                qdict = node.value
    if qdict is None:
        return {}

    out: dict[str, str] = {}
    for key, val in zip(qdict.keys, qdict.values):
        if not (isinstance(key, ast.Constant) and isinstance(key.value, str)):
            continue
        entry_seg = _segment(lines, val)
        defs, fallback = _entry_material(tree, relpath, val)
        h = hashlib.sha256()
        h.update(entry_seg.encode())
        for m, n, dh in defs:
            h.update(b"\x00")
            h.update(f"{m}:{n}:{dh}".encode())
        for f in sorted(fallback):
            h.update(b"\x01")
            h.update(f.encode())
            h.update(tree.file_hash(f).encode())
        out[key.value] = h.hexdigest()
    return out


def fingerprint_all(root: str) -> dict[str, str]:
    """Fingerprint every registered query under ``root`` (a repo root —
    live or an archived historical tree). Returns {query_name: sha256}.

    The fingerprint covers exactly the sources whose change should force
    re-verification: the registry entry, and the def-level transitive
    closure of every definition it reaches across package modules (plus
    whole-file fallbacks where a reference can't be followed statically).
    External libraries and unrelated definitions do not participate."""
    tree = _Tree(root)
    out: dict[str, str] = {}
    for rel in REGISTRY_RELPATHS:
        if os.path.isfile(os.path.join(root, rel)):
            out.update(_registry_fingerprints(tree, rel))
    return out
