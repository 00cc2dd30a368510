"""Physical-plan inspection utilities: make 'the plan we want' a testable
assertion instead of a code-review hope."""
