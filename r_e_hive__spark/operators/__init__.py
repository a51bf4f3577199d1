"""Operator library — reusable DataFrame-level operators.

One module per SURVEY.md §2 operator family.  Everything here is a plain
function ``DataFrame -> DataFrame`` (or a small builder class), declarative
where possible so Catalyst keeps optimizing through it.
"""
