"""Registered, oracle-checkable query plans (SURVEY.md §2 inventory)."""
