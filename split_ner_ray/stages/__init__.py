"""Ray Data stages: each module is one operator family from SURVEY.md §2."""
