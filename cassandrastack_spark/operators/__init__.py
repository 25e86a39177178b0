"""Custom relational operators the reference's north star needs but Spark
lacks as single built-ins — each expressed as a composition of DataFrame
ops (never driver-side loops), per SURVEY.md §7.3."""
