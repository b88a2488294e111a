"""Source-level invariant checks.

The one that matters operationally: never close over the GraphContext in
a jitted function. Closed-over ctx constants (banded adjacency blocks,
megabytes of f32) get inlined into the HLO, and on the remote-attached
backend the compile upload fails with HTTP 413 (see CLAUDE.md). All
production code must pass ctx as a jit *argument*.
"""

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "cape_tpu"


def _lambda_free_names(node: ast.Lambda) -> set[str]:
    params = {a.arg for a in (
        node.args.args + node.args.posonlyargs + node.args.kwonlyargs
    )}
    if node.args.vararg:
        params.add(node.args.vararg.arg)
    if node.args.kwarg:
        params.add(node.args.kwarg.arg)
    used = {
        n.id for n in ast.walk(node.body) if isinstance(n, ast.Name)
    }
    return used - params


def _is_jit_call(call: ast.Call) -> bool:
    f = call.func
    if isinstance(f, ast.Attribute) and f.attr == "jit":
        return True  # jax.jit / anything.jit
    return isinstance(f, ast.Name) and f.id == "jit"


def test_no_jitted_lambda_closes_over_ctx():
    offenders = []
    root = PKG.parent
    scan = list(PKG.rglob("*.py")) + list(root.glob("*.py"))
    for path in sorted(scan):
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if not (isinstance(node, ast.Call) and _is_jit_call(node)):
                continue
            for arg in node.args:
                if isinstance(arg, ast.Lambda):
                    free = _lambda_free_names(arg)
                    if "ctx" in free:
                        offenders.append(f"{path}:{arg.lineno}")
    assert not offenders, (
        "jitted lambdas closing over ctx (inlines GraphContext into HLO, "
        "HTTP 413 on remote compile): " + ", ".join(offenders)
    )
