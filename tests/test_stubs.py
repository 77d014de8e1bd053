"""Type-stub smoke checks.

No type checker is installed in this environment, so the ``.pyi`` files
are validated structurally instead: every stubbed name must exist at
runtime with matching function parameter names, and every runtime
``__all__`` export must be stubbed (the reference ships a checked
``extension/__init__.pyi``; SURVEY §2.2).
"""

import ast
import importlib
import inspect
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

STUBS = {
    "tetranerf_tpu": "tetranerf_tpu/__init__.pyi",
    "tetranerf_tpu.ops": "tetranerf_tpu/ops/__init__.pyi",
    "tetranerf_tpu.models": "tetranerf_tpu/models/__init__.pyi",
    "tetranerf_tpu.training": "tetranerf_tpu/training/__init__.pyi",
    "tetranerf_tpu.geometry": "tetranerf_tpu/geometry/__init__.pyi",
    "tetranerf_tpu.parallel": "tetranerf_tpu/parallel/__init__.pyi",
    "tetranerf_tpu.tracer": "tetranerf_tpu/tracer.pyi",
}

_STUB_ONLY = {
    # TypedDict result schemas / aliases that exist only in stubs.
    "ArrayLike", "Params", "Batch", "Metrics",
    "TraceRaysResult", "FindVisitedCellsResult",
    "FindTetrahedraResult", "TraceRaysTrianglesResult",
}


def _stub_defs(tree):
    """Top-level functions/classes (with methods) defined in a stub."""
    funcs, classes = {}, {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs[node.name] = node
        elif isinstance(node, ast.ClassDef):
            methods = {
                n.name: n
                for n in node.body
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            }
            classes[node.name] = methods
    return funcs, classes


def _param_names(node):
    a = node.args
    names = [p.arg for p in a.posonlyargs + a.args + a.kwonlyargs]
    if a.vararg:
        names.append(a.vararg.arg)
    if a.kwarg:
        names.append(a.kwarg.arg)
    return [n for n in names if n != "self"]


def _runtime_params(obj):
    try:
        sig = inspect.signature(obj)
    except (ValueError, TypeError):
        return None
    return [n for n in sig.parameters if n != "self"]


@pytest.mark.parametrize("module_name,stub_path", sorted(STUBS.items()))
def test_stub_matches_runtime(module_name, stub_path):
    tree = ast.parse((ROOT / stub_path).read_text())
    mod = importlib.import_module(module_name)
    funcs, classes = _stub_defs(tree)

    for name, node in funcs.items():
        assert hasattr(mod, name), f"{module_name}.{name} stubbed but missing"
        rt = _runtime_params(getattr(mod, name))
        if rt is not None:
            stub = _param_names(node)
            assert stub == rt, (
                f"{module_name}.{name} params drifted: stub={stub} rt={rt}"
            )

    for cls_name, methods in classes.items():
        if cls_name in _STUB_ONLY:
            continue
        assert hasattr(mod, cls_name), f"{module_name}.{cls_name} missing"
        cls = getattr(mod, cls_name)
        for mname, node in methods.items():
            if mname == "__init__" and "kwargs" in _param_names(node):
                continue  # catch-all stub (dataclass __init__)
            assert hasattr(cls, mname), f"{cls_name}.{mname} missing"
            rt = _runtime_params(getattr(cls, mname))
            if rt is not None and mname != "__init__":
                stub = _param_names(node)
                assert stub == rt, (
                    f"{cls_name}.{mname} params drifted: "
                    f"stub={stub} rt={rt}"
                )

    # Every public runtime export must appear in the stub.
    stubbed = set(funcs) | set(classes) | {
        t.name if t.asname is None else t.asname
        for node in tree.body
        if isinstance(node, ast.ImportFrom)
        for t in node.names
    } | {
        n.target.id
        for n in tree.body
        if isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name)
    }
    for name in getattr(mod, "__all__", []):
        assert name in stubbed, f"{module_name}.__all__ has unstubbed {name}"
