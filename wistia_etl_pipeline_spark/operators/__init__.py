"""Relational operators: flatten/project, dedup, merge/upsert, rollup, joins."""
