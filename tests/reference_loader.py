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


def load_reference_module(rel_path: str, mod_name: str) -> types.ModuleType:
    """Import defs + constant assigns of a reference file; skip execution."""
    _install_stubs()
    path = f"{REFERENCE_ROOT}/{rel_path}"
    with open(path, encoding="utf-8") as fh:
        tree = ast.parse(fh.read(), filename=path)
    kept: list[ast.stmt] = []
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom, ast.FunctionDef,
                             ast.AsyncFunctionDef, ast.ClassDef)):
            kept.append(node)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)) and not _has_call(node):
            kept.append(node)
    module = types.ModuleType(mod_name)
    module.__file__ = path
    code = compile(ast.Module(body=kept, type_ignores=[]), path, "exec")
    exec(code, module.__dict__)  # noqa: S102 — read-only reference, tests only
    sys.modules[mod_name] = module
    return module
