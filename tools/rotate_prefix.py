"""Compute the next round's flagship prefix: never-certified + sentinels.

The driver certifies only the first 50 registry entries each round
(`registry._FLAGSHIP_PREFIX`), so the prefix rotates to ACCUMULATE
coverage. Two pools feed a rotation (VERDICT r9 ask #6):

1. **Never-certified** — registry names minus every entry ever green in a
   committed CORRECTNESS_r*.json (default output, grouped by module).
2. **Sentinels** (``--sentinels``) — entries whose *code changed after
   their last driver certification*: for each certified entry, the tool
   finds the commit that last touched its certifying CORRECTNESS file,
   extracts the entry's query-function source at HEAD, and checks whether
   that exact text already existed in the defining module at the
   certification commit. Function text absent -> the function was edited
   since certification -> re-certify (CERTAIN sentinel). Function text
   present but the module file differs -> shared helpers/constants/oracle
   strings may have moved under it -> REVIEW candidate (listed separately;
   promote to the prefix on judgment). This is a text-level check: it
   cannot see changes routed through another module's helpers — new
   entries and judged rewrites should still be staged explicitly.

Usage: python tools/rotate_prefix.py [repo_root] [--sentinels]
"""

from __future__ import annotations

import ast
import glob
import inspect
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_flight_bigdata_dashboard_spark import registry


def _green(cell) -> bool:
    return (
        isinstance(cell, dict)
        and cell.get("rows_match")
        and cell.get("schema_match")
        and cell.get("hash_match") in (True, None)
    )


def _last_certified(root: str) -> dict[str, str]:
    """entry name -> path of the LATEST correctness file certifying it."""
    last: dict[str, str] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        data = json.load(open(f))
        for name, cell in data.items():
            if _green(cell):
                last[name] = f
    return last


def _git(root: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", root, *args], check=True, capture_output=True, text=True
    ).stdout


def never_certified(root: str) -> None:
    certified = set(_last_certified(root))
    by_module: dict[str, list[str]] = {}
    for mod in registry._MODULES:
        for name in mod.QUERIES:
            if name not in certified:
                by_module.setdefault(mod.__name__.rsplit(".", 1)[-1], []).append(name)
    total = sum(len(v) for v in by_module.values())
    print(f"certified: {len(certified)}  registry: {len(registry.queries())}  "
          f"never-certified pool: {total}")
    for mod, names in sorted(by_module.items()):
        print(f"\n# {mod} ({len(names)})")
        for n in sorted(names):
            print(f'    "{n}",')


def _code_dump(src: str, fname: str) -> tuple[str, str] | None:
    """AST dump of ``fname``'s body with the leading docstring statement
    dropped — whether it is a plain string constant or a ``"...".format(...)``
    / ``"...".replace(...)`` call on a string constant (the pre-r13 inline
    pattern). Two functions with equal dumps differ at most in documentation,
    which cannot change query results, so a text-level CERTAIN sentinel whose
    dumps match is demoted to doc-only (round-14 upgrade: r13's docstring
    normalization flagged 72 entries whose code bodies were untouched)."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == fname:
            body = node.body
            if body and isinstance(body[0], ast.Expr):
                v = body[0].value
                is_doc = isinstance(v, ast.Constant) and isinstance(v.value, str)
                while (
                    not is_doc
                    and isinstance(v, ast.Call)
                    and isinstance(v.func, ast.Attribute)
                    and v.func.attr in ("format", "replace")
                ):
                    v = v.func.value
                    is_doc = isinstance(v, ast.Constant) and isinstance(v.value, str)
                if is_doc:
                    body = body[1:]
            return (
                ast.dump(ast.Module(body=body, type_ignores=[])),
                ast.dump(node.args),
            )
    return None


def sentinels(root: str) -> None:
    last = _last_certified(root)
    qs = registry.queries()
    # one commit lookup per correctness file, one old-blob read per
    # (commit, module) pair
    commit_of: dict[str, str] = {}
    old_blob: dict[tuple[str, str], str | None] = {}
    certain: list[tuple[str, str, str]] = []
    doc_only: list[tuple[str, str, str]] = []
    review: list[tuple[str, str, str]] = []
    for name, fn in qs.items():
        cert_file = last.get(name)
        if cert_file is None:
            continue  # never certified -> pool 1, not a sentinel
        if cert_file not in commit_of:
            commit_of[cert_file] = _git(
                root, "log", "-1", "--format=%H", "--", os.path.basename(cert_file)
            ).strip()
        commit = commit_of[cert_file]
        src_file = os.path.relpath(inspect.getsourcefile(fn), root)
        key = (commit, src_file)
        if key not in old_blob:
            try:
                old_blob[key] = _git(root, "show", f"{commit}:{src_file}")
            except subprocess.CalledProcessError:
                old_blob[key] = None  # file did not exist at certification
        old = old_blob[key]
        rnd = os.path.basename(cert_file)[len("CORRECTNESS_"):-len(".json")]
        if old is None:
            certain.append((name, rnd, f"{src_file} absent at certification commit"))
            continue
        head_src = inspect.getsource(fn)
        if head_src not in old:
            # Text changed — but a docstring-only edit cannot change results.
            # Compare AST code bodies (sans docstring statement) before
            # promoting to CERTAIN.
            old_dump = _code_dump(old, fn.__name__)
            new_dump = _code_dump(
                open(os.path.join(root, src_file)).read(), fn.__name__
            )
            if old_dump is not None and old_dump == new_dump:
                doc_only.append((name, rnd, src_file))
            else:
                certain.append((name, rnd, f"{src_file}: function code changed"))
        elif old != open(os.path.join(root, src_file)).read():
            review.append((name, rnd, f"{src_file}: module changed around it"))
    print(f"CERTAIN sentinels (function CODE edited since last certification): "
          f"{len(certain)}")
    for name, rnd, why in sorted(certain):
        print(f'    "{name}",  # certified {rnd}; {why}')
    print(f"\ndoc-only sentinels (text changed, AST code body identical — "
          f"no re-cert needed): {len(doc_only)}")
    by_mod: dict[str, int] = {}
    for _, _, src_file in doc_only:
        by_mod[src_file] = by_mod.get(src_file, 0) + 1
    for mod_file, n in sorted(by_mod.items()):
        print(f"  {mod_file}: {n}")
    names_in_review = sorted({n for n, _, _ in review})
    print(f"\nREVIEW candidates (module file changed, function text intact): "
          f"{len(names_in_review)}")
    by_why: dict[str, list[str]] = {}
    for name, rnd, why in review:
        by_why.setdefault(why.split(":")[0], []).append(name)
    for mod_file, names in sorted(by_why.items()):
        print(f"  {mod_file}: {len(names)} entries "
              f"({', '.join(sorted(names)[:6])}{'...' if len(names) > 6 else ''})")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    want_sentinels = "--sentinels" in args
    args = [a for a in args if a != "--sentinels"]
    root = args[0] if args else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    if want_sentinels:
        sentinels(root)
    else:
        never_certified(root)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
