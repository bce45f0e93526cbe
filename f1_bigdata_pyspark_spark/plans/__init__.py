"""Plan-inspection helpers — assertions about the physical plan."""
