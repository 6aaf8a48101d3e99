"""Typed-surface verification: ppca_rs_tpu/__init__.pyi vs the runtime.

pyright/mypy are not installed in this environment, so this test does the
equivalent consistency check directly: every class, method, function and
attribute declared in the stub must exist at runtime, and every declared
method's parameter names must match the implementation (the reference's own
stub was stale exactly this way — SURVEY.md §2.3)."""

import ast
import inspect
import pathlib

import pytest

import ppca_rs_tpu

STUB = pathlib.Path(ppca_rs_tpu.__file__).with_name("__init__.pyi")

# Names in the stub that intentionally have no (public) runtime counterpart.
TYPE_ALIASES = {"ArrayLike", "KeyArray", "Metric", "MetricsCallback", "ChunkLike"}


def stub_tree():
    return ast.parse(STUB.read_text())


def test_stub_parses():
    stub_tree()  # SyntaxError here = broken stub


def test_every_stub_name_exists_at_runtime():
    tree = stub_tree()
    for node in tree.body:
        if isinstance(node, ast.ClassDef):
            if node.name == "Config":
                runtime = type(ppca_rs_tpu.config)
            else:
                runtime = getattr(ppca_rs_tpu, node.name, None)
            assert runtime is not None, f"stub class {node.name} missing at runtime"
            for item in node.body:
                if isinstance(item, ast.FunctionDef):
                    assert hasattr(runtime, item.name), (
                        f"{node.name}.{item.name} declared in stub but missing"
                    )
                elif isinstance(item, ast.AnnAssign) and isinstance(item.target, ast.Name):
                    attr = item.target.id
                    ok = (
                        hasattr(runtime, attr)
                        or attr in getattr(runtime, "__slots__", ())
                        or attr in getattr(runtime, "__annotations__", {})
                        or attr
                        in getattr(
                            getattr(runtime, "__init__", None), "__annotations__", {}
                        )
                        or attr in {f.name for f in _dataclass_fields(runtime)}
                    )
                    assert ok, f"{node.name}.{attr} declared in stub but missing"
        elif isinstance(node, ast.FunctionDef):
            assert hasattr(ppca_rs_tpu, node.name), f"stub function {node.name} missing"
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            name = node.target.id
            if name not in TYPE_ALIASES:
                assert hasattr(ppca_rs_tpu, name), f"stub attribute {name} missing"


def _dataclass_fields(cls):
    import dataclasses

    try:
        return dataclasses.fields(cls)
    except TypeError:
        return []


def _params_of(fn):
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return None
    return [p for p in sig.parameters.values() if p.name not in ("self", "cls")]


def test_stub_signatures_match_runtime():
    """Declared parameter names (and their order) must match the
    implementation for every method present in both."""
    tree = stub_tree()
    mismatches = []
    for node in tree.body:
        if not isinstance(node, ast.ClassDef):
            continue
        runtime = (
            type(ppca_rs_tpu.config)
            if node.name == "Config"
            else getattr(ppca_rs_tpu, node.name)
        )
        for item in node.body:
            if not isinstance(item, ast.FunctionDef):
                continue
            if any(
                isinstance(d, ast.Name) and d.id == "property" for d in item.decorator_list
            ):
                continue
            impl = inspect.getattr_static(runtime, item.name, None)
            if isinstance(impl, property) or impl is None:
                continue
            if isinstance(impl, (staticmethod, classmethod)):
                impl = impl.__func__
            params = _params_of(impl)
            if params is None:
                continue
            a = item.args
            stub_names = [arg.arg for arg in a.args + a.kwonlyargs if arg.arg not in ("self", "cls")]
            impl_names = [
                p.name
                for p in params
                if p.kind
                not in (inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD)
                and not p.name.startswith("_")
            ]
            if stub_names != impl_names:
                mismatches.append(
                    f"{node.name}.{item.name}: stub{stub_names} != impl{impl_names}"
                )
    assert not mismatches, "\n".join(mismatches)
