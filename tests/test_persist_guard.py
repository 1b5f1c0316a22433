"""Mechanical persist-leak guard (VERDICT r8 item 4).

Two persist hygiene classes exist in the engine package:

1. A SINGLE ``persist()`` backing the returned lazy DataFrame — the
   cache is populated by the caller's one action and evicted by the
   gate/bench ``clearCache()``. Bounded at one cache per call;
   legitimate, not flagged.
2. ``persist()`` INSIDE a loop (iterate-style ops: BFS relaxation, BPE
   rounds, greedy set cover...) — one cache pinned PER ITERATION. This
   is the leak class the r8 verdict flagged on
   ``graph_bfs_landmark_distances`` (5 caches/call): round i-1's state
   must be unpersisted once round i materializes.

This guard enforces class 2 mechanically: any ``persist()``/``cache()``
lexically inside a ``for``/``while`` whose enclosing function never
calls ``unpersist()`` fails. The fix is eager per-round
materialization + predecessor unpersist (see
``graph_bfs_landmark_distances`` / ``docs_bpe_multi_merge``), not
deleting the persist — the persist is usually load-bearing against
2^rounds re-evaluation of the shared subtree.
"""

import ast
import os

PKG = os.path.join(os.path.dirname(__file__), "..", "rad_database_parse_spark")


def _loop_persist_offenders():
    offenders = []
    for dirpath, _dirs, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            tree = ast.parse(open(path).read())

            class V(ast.NodeVisitor):
                def __init__(self):
                    # per-function stack: [name, saw_unpersist, loop_persist_lines]
                    self.fn = []
                    self.loop_depth = 0

                def visit_FunctionDef(self, n):
                    self.fn.append([n.name, False, []])
                    outer_loop = self.loop_depth
                    self.loop_depth = 0
                    self.generic_visit(n)
                    self.loop_depth = outer_loop
                    name, saw_unpersist, lines = self.fn.pop()
                    if lines and not saw_unpersist:
                        rel = os.path.relpath(path, PKG)
                        offenders.append(f"{rel}::{name} lines {lines}")

                visit_AsyncFunctionDef = visit_FunctionDef

                def visit_For(self, n):
                    self.loop_depth += 1
                    self.generic_visit(n)
                    self.loop_depth -= 1

                visit_While = visit_For

                def visit_Call(self, n):
                    if isinstance(n.func, ast.Attribute):
                        if (
                            n.func.attr in ("persist", "cache")
                            and self.fn
                            and self.loop_depth
                        ):
                            self.fn[-1][2].append(n.lineno)
                        if n.func.attr == "unpersist" and self.fn:
                            self.fn[-1][1] = True
                    self.generic_visit(n)

            V().visit(tree)  # offenders filled via closure
    return offenders


def test_no_persist_in_loop_without_unpersist():
    offenders = _loop_persist_offenders()
    assert not offenders, (
        "persist() inside a loop with no unpersist() in the same function "
        "(one leaked cache per iteration): " + ", ".join(offenders)
        + " — materialize each round eagerly and unpersist the previous "
        "round's state (see graph_bfs_landmark_distances)"
    )


def test_guard_sees_the_known_iterate_sites():
    # sanity: the walker actually parses the package — the two known
    # loop-persist sites (BFS rounds, BPE rounds) must be visible to the
    # AST scan as persist-in-loop WITH unpersist (i.e., fixed, not missed)
    found = set()
    for dirpath, _dirs, files in os.walk(PKG):
        for fn in files:
            if fn in ("round7k_ops.py", "round7r_ops.py"):
                src = open(os.path.join(dirpath, fn)).read()
                if ".unpersist()" in src and ".persist()" in src:
                    found.add(fn)
    assert found == {"round7k_ops.py", "round7r_ops.py"}
