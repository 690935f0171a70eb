#!/usr/bin/env python
"""One-shot refactoring tool (VERDICT r02 ask #9): split the
monolithic queries.py into a queries/ package — a_core / a_stats /
b_llm / c_temporal family modules with __init__.py holding the
registry assembly and rotation. Pure mechanical move: block order
inside each module preserves original file order; cross-module
references resolve via GENERATED explicit imports; helper blocks that
would create import cycles are relocated to the earliest module that
needs them.

Run from the repo root; writes parking_bigdata_spark/queries/ and
deletes queries.py. Verify with the test suite + registry-equality
check afterwards.
"""

from __future__ import annotations

import ast
import builtins
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "parking_bigdata_spark", "queries.py")
PKG = os.path.join(REPO, "parking_bigdata_spark", "queries")

src = open(SRC).read()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)

FAM_RE = re.compile(r"^#\s*(A|B|C)\d")


def stmt_names(node) -> list[str]:
    if isinstance(node, ast.FunctionDef):
        return [node.name]
    if isinstance(node, ast.Assign):
        return [t.id for t in node.targets if isinstance(t, ast.Name)]
    if isinstance(node, ast.AnnAssign) and isinstance(node.target,
                                                     ast.Name):
        return [node.target.id]
    return []


blocks = []
prev_end = 0
family = "a"
for node in tree.body:
    start = node.lineno - 1
    cstart = start
    while cstart > prev_end and (lines[cstart - 1].strip().startswith("#")
                                 or not lines[cstart - 1].strip()):
        cstart -= 1
    comment = "".join(lines[cstart:start])
    for cl in comment.splitlines():
        m = FAM_RE.match(cl.strip())
        if m:
            family = m.group(1).lower()
    end = node.end_lineno
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        kind = "import"
    elif isinstance(node, ast.Expr) and isinstance(node.value,
                                                   ast.Constant):
        kind = "docstring"
    else:
        kind = "code"
    blocks.append({"names": stmt_names(node), "family": family,
                   "text": comment + "".join(lines[start:end]),
                   "kind": kind})
    prev_end = end

# registry tail -> __init__ (from the REGISTRY literal onward)
reg_idx = next(i for i, b in enumerate(blocks) if "REGISTRY" in b["names"])
init_blocks = blocks[reg_idx:]
head = blocks[:reg_idx]

preamble = [b for b in head if b["kind"] in ("import", "docstring")]
code = [b for b in head if b["kind"] == "code"]


def fix_rel(text: str) -> str:
    return re.sub(r"\bfrom \.(?=[a-z_])", "from ..",
                  text.replace("from . import", "from .. import"))


preamble_imports = fix_rel("".join(b["text"] for b in preamble
                                   if b["kind"] == "import"))
docstring = next((b["text"] for b in preamble
                  if b["kind"] == "docstring"), "")


def free_names(module_text: str) -> set[str]:
    t = ast.parse(module_text)
    loaded, stored = set(), set()

    class V(ast.NodeVisitor):
        def visit_Name(self, n):
            (loaded if isinstance(n.ctx, ast.Load) else stored).add(n.id)
            self.generic_visit(n)

        def visit_FunctionDef(self, n):
            stored.add(n.name)
            a = n.args
            for x in a.args + a.kwonlyargs + a.posonlyargs:
                stored.add(x.arg)
            if a.vararg:
                stored.add(a.vararg.arg)
            if a.kwarg:
                stored.add(a.kwarg.arg)
            self.generic_visit(n)

        def visit_Lambda(self, n):
            a = n.args
            for x in a.args + a.kwonlyargs + a.posonlyargs:
                stored.add(x.arg)
            self.generic_visit(n)

        def visit_ExceptHandler(self, n):
            if n.name:
                stored.add(n.name)
            self.generic_visit(n)

        def visit_Import(self, n):
            for al in n.names:
                stored.add((al.asname or al.name).split(".")[0])

        def visit_ImportFrom(self, n):
            for al in n.names:
                stored.add(al.asname or al.name)

    V().visit(t)
    return {n for n in loaded - stored if not hasattr(builtins, n)}


def block_free(b) -> set[str]:
    return free_names(preamble_imports + "\n" + fix_rel(b["text"]))


# route by family, then resolve cross-module deps by MOVING blocks
# into the earliest module that needs them (keeps imports acyclic:
# later modules may import earlier ones, never the reverse)
ORDER = ["a", "b", "c"]
routed = {m: [b for b in code if b["family"] == m] for m in ORDER}

moved = True
while moved:
    moved = False
    defs = {m: {n for b in routed[m] for n in b["names"]} for m in ORDER}
    for mi, m in enumerate(ORDER):
        need = set()
        for b in routed[m]:
            need |= block_free(b)
        for later in ORDER[mi + 1:]:
            pull = need & defs[later]
            if pull:
                take = [b for b in routed[later]
                        if set(b["names"]) & pull]
                routed[later] = [b for b in routed[later]
                                 if b not in take]
                # prepend, preserving original order
                routed[m] = take + routed[m]
                moved = True
    if moved:
        continue

# split family "a" (largest) into sequential parts <= ~2600 lines,
# cutting only where no earlier-part block references a later name
parts = []
for m in ORDER:
    bs = routed[m]
    total = sum(len(b["text"].splitlines()) for b in bs)
    if total <= 2900:
        parts.append((m if m != "a" else "a_core", bs))
        continue
    # find a cut: prefix size near half where prefix free-names don't
    # intersect suffix defs
    best = None
    acc = 0
    sizes = [len(b["text"].splitlines()) for b in bs]
    for i in range(1, len(bs)):
        acc += sizes[i - 1]
        if acc < total * 0.4 or acc > total * 0.65:
            continue
        pre, suf = bs[:i], bs[i:]
        suf_defs = {n for b in suf for n in b["names"]}
        pre_free = set()
        for b in pre:
            pre_free |= block_free(b)
        if not (pre_free & suf_defs):
            best = i
            break
    assert best, f"no clean cut for family {m}"
    parts.append(("a_core", bs[:best]))
    parts.append(("a_stats", bs[best:]))

NAME_MAP = {"b": "b_llm", "c": "c_temporal"}
parts = [(NAME_MAP.get(n, n), bs) for n, bs in parts]

os.makedirs(PKG, exist_ok=True)
written = []  # (modname, defs)
mod_srcs = {}
for modname, bs in parts:
    body = fix_rel("".join(b["text"] for b in bs))
    full = preamble_imports + "\n" + body
    free = free_names(full)
    imports = []
    for prev, prev_defs in written:
        need = sorted(free & prev_defs)
        if need:
            imports.append(f"from .{prev} import (  # noqa: E501\n    "
                           + ",\n    ".join(need) + ",\n)\n")
    header = (f'"""Query registry — {modname} module (mechanically '
              f'split from queries.py in r03; the REGISTRY and driver '
              f'rotation live in the package __init__)."""\n\n')
    text = header + preamble_imports + "".join(imports) + "\n" + body
    mod_srcs[modname] = text
    with open(os.path.join(PKG, modname + ".py"), "w") as f:
        f.write(text)
    written.append((modname, {n for b in bs for n in b["names"]}))

init_body = fix_rel("".join(b["text"] for b in init_blocks))
init_free = free_names(preamble_imports + "\n" + init_body)
init_imports = []
for prev, prev_defs in written:
    need = sorted(init_free & prev_defs)
    pub = sorted(n for n in prev_defs
                 if not n.startswith("_") and n not in need)
    both = need + pub
    if both:
        init_imports.append(f"from .{prev} import (  # noqa: E501,F401\n    "
                            + ",\n    ".join(both) + ",\n)\n")
init_text = (docstring + "\n" + preamble_imports
             + "".join(init_imports) + "\n" + init_body)
with open(os.path.join(PKG, "__init__.py"), "w") as f:
    f.write(init_text)

os.remove(SRC)
for modname, _ in written:
    print(modname, len(mod_srcs[modname].splitlines()), "lines")
print("__init__.py", len(init_text.splitlines()), "lines")
