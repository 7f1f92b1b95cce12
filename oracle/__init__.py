"""Pure-Python/numpy oracle for the miekki-spark dedup engine.

Single-process reference implementations of every kernel the Spark
pipeline runs (SURVEY.md §5.1). The Spark output must match these
bit-for-bit; golden files under tests/golden/ freeze the oracle so
refactors can't silently drift. No pyspark imports allowed here.
"""
