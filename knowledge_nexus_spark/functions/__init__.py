"""Column expressions and Arrow-vectorized UDFs (SURVEY.md §2.2, §2.8)."""
