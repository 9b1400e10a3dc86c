"""Command-line entry points (UX parity with the reference scripts)."""
