"""Sources & sinks for the h2h wire formats (FLAT / CSV / XML) + merge/meta."""
