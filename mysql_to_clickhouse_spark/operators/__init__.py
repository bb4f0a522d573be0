"""Operator modules — one per SURVEY.md §2 section.

Importing a module registers its queries in
``mysql_to_clickhouse_spark.registry`` (IDs = §2 row IDs).
"""
