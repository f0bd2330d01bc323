{"params": {"lr": 0.001, "seed": 2023}, "valid_ent_mrr_raw": 0.2743131540945034}
{"params": {"lr": 0.001, "seed": 2024}, "valid_ent_mrr_raw": 0.23283605915639005}
{"params": {"lr": 0.001, "seed": 2025}, "valid_ent_mrr_raw": 0.2911405470596504}
{"params": {"lr": 0.0005, "seed": 2023}, "valid_ent_mrr_raw": 0.22683394404897586}
{"params": {"lr": 0.0005, "seed": 2024}, "valid_ent_mrr_raw": 0.2552292648743917}
{"params": {"lr": 0.0005, "seed": 2025}, "valid_ent_mrr_raw": 0.25772007268381175}
