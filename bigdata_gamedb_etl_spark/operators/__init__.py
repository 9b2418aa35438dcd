"""Operator modules. Each exports QUERIES (name → callable) and ORACLE
(name → DuckDB SQL twin); see registry.py."""
