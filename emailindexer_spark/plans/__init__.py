"""Logical query/build plans: parser → AST → DataFrame program."""
