"""Sources: CAP XML parsing (X1), HTTP fetch (S1/S2), feed snapshots."""
