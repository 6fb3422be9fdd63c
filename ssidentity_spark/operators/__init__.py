"""Reusable DataFrame operators (library surface, independent of the driver
testdata). The plans/ package applies these to the testdata tables; tests
apply them to the reference-shaped fixture tables (FIXTURES.md)."""
