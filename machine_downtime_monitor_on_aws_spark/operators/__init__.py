"""Operator library: composable DataFrame -> DataFrame transforms."""
