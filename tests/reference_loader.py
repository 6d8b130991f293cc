"""Load reference modules from /root/reference for differential testing.

The reference scripts are import-hostile: most execute their whole pipeline
at module level and import PDF/OCR libraries this container lacks. This
loader makes their PURE functions callable anyway:

- missing third-party modules (fitz, pdfplumber, pytesseract, PIL, tabula,
  requests, PyPDF2, cv2, wand) are stubbed with MagicMock in sys.modules;
- the module AST is filtered to imports, function/class definitions and
  side-effect-free constant assignments (no ast.Call in the value), which
  keeps pattern banks / gazetteers / token constants and drops the
  top-level pipeline execution.

Used ONLY by tests, read-only, to verify that the oracle reproduces the
reference semantics function-for-function (the strongest per-turn-equality
evidence available without PDFs).
"""

from __future__ import annotations

import ast
import sys
import types
from unittest.mock import MagicMock

REFERENCE_ROOT = "/root/reference"

_STUBS = [
    "fitz", "pdfplumber", "pytesseract", "PIL", "PIL.Image", "PIL.ImageEnhance",
    "PIL.ImageFilter", "tabula", "requests", "PyPDF2", "cv2", "wand", "wand.image",
]


def _install_stubs() -> None:
    for name in _STUBS:
        if name not in sys.modules:
            sys.modules[name] = MagicMock(name=name)


def _has_call(node: ast.AST) -> bool:
    """True for side-effecting calls; pure builtins like len() are allowed
    (e.g. household.py's ``slaves_token_len = len(slaves_token)``)."""
    for n in ast.walk(node):
        if isinstance(n, ast.Call):
            if isinstance(n.func, ast.Name) and n.func.id in ("len", "str", "int"):
                continue
            return True
    return False


def _defsite_has_call(fn) -> bool:
    """Call anywhere a ``def`` EXECUTES code at definition time: decorators,
    argument defaults, and annotations (``def f(x=__import__('os')...)``
    would otherwise run during exec). The function BODY is not def-time."""
    a = fn.args
    exprs: list = list(fn.decorator_list)
    exprs += [d for d in a.defaults if d is not None]
    exprs += [d for d in a.kw_defaults if d is not None]
    for arg in [*a.posonlyargs, *a.args, *a.kwonlyargs, a.vararg, a.kwarg]:
        if arg is not None and arg.annotation is not None:
            exprs.append(arg.annotation)
    if fn.returns is not None:
        exprs.append(fn.returns)
    return any(_has_call(e) for e in exprs)


def _class_is_safe(cls: ast.ClassDef) -> bool:
    """A ClassDef's decorators, bases, keywords and BODY statements all
    execute at module-exec time — admit only classes whose def-time
    surfaces are call-free and whose body is defs/constants/docstrings."""
    if any(_has_call(e) for e in [*cls.decorator_list, *cls.bases]):
        return False
    if any(_has_call(k.value) for k in cls.keywords):
        return False
    for stmt in cls.body:
        if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if _defsite_has_call(stmt):
                return False
        elif isinstance(stmt, (ast.Assign, ast.AnnAssign)):
            if _has_call(stmt):
                return False
        elif isinstance(stmt, ast.Expr) and isinstance(stmt.value, ast.Constant):
            continue  # docstring
        elif isinstance(stmt, ast.Pass):
            continue
        else:
            return False
    return True


def load_reference_module(rel_path: str, mod_name: str) -> types.ModuleType:
    """Import defs + constant assigns of a reference file; skip execution.

    Def-time execution surfaces (decorators, default-argument expressions,
    annotations, class bodies) are screened for calls so a hostile update
    to the public reference repo cannot run code during the exec below.
    Residual risk — and why it is acceptable: the differential tests then
    CALL selected reference functions on fixture inputs, which executes
    those function bodies; that is the entire point of differential
    testing, and the screened namespace gives them no pre-executed state.
    """
    _install_stubs()
    path = f"{REFERENCE_ROOT}/{rel_path}"
    with open(path, encoding="utf-8") as fh:
        tree = ast.parse(fh.read(), filename=path)
    kept: list[ast.stmt] = []
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            kept.append(node)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if not _defsite_has_call(node):
                kept.append(node)
        elif isinstance(node, ast.ClassDef):
            if _class_is_safe(node):
                kept.append(node)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)) and not _has_call(node):
            kept.append(node)
    module = types.ModuleType(mod_name)
    module.__file__ = path
    code = compile(ast.Module(body=kept, type_ignores=[]), path, "exec")
    exec(code, module.__dict__)  # noqa: S102 — read-only reference, tests only
    sys.modules[mod_name] = module
    return module
