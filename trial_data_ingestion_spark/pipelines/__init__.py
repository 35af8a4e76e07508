"""Pipeline builders: lazy end-to-end DAGs composing the operator
tiers (SURVEY.md §3)."""
