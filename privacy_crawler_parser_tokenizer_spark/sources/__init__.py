"""Sources & sinks: testdata loaders, synthetic fixtures, warehouse."""
