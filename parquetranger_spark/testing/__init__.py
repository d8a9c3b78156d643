"""Test-support assets (in-process protocol stubs). Not part of the engine
runtime — imported only by the test suite."""
