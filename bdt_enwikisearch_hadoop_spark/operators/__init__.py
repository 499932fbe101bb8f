"""Relational operators (SURVEY.md §2.A-G) — each module registers its queries on import."""
