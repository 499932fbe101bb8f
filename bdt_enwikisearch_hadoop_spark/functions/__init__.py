"""Scalar/text/LLM/UDF function surfaces (SURVEY.md §2.H-L, j8+, m*)."""
