"""Pipeline engines: frame construction, tracking, mapping, loop closing, system facade."""
