"""Query plans: parity + extension query builders and the driver registry."""
