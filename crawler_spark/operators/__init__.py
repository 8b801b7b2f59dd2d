"""Relational/dataflow operators of the crawl engine (SURVEY.md §2)."""
