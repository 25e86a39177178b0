"""Column-expression function library (SURVEY.md §2.4: the reference's
only scalar function is now(); this package is the engine's function
surface — all JVM-side expressions unless physically impossible)."""
