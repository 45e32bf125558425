"""The in-repo lint gate stays green (see tools/lint.py: the executable
stand-in for the CI-declared ruff/mypy jobs, which are unavailable in
offline environments)."""

import pathlib

from tools.lint import run as lint_run


def test_lint_clean():
    root = pathlib.Path(__file__).resolve().parent.parent
    files, problems = lint_run(root)
    assert len(files) > 50
    assert not problems, "\n".join(
        f"{p}:{line}: {code} {msg}" for p, line, code, msg in problems
    )
