"""Post-hoc evaluation: on-device spike metrics over generated-sample files."""
