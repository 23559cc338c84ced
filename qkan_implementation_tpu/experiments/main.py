"""Experiment runner: ``python -m qkan_implementation_tpu.experiments.main cfg.yaml``.

Rebuild of ``Testing and Visualization Framework/main.py`` (reference
``:15-157``): YAML config -> data pipeline -> per-model/per-trial training
('qkan' via DegreeOptimizer, 'mlp' via the baseline trainer) -> ModelResult
records -> PNG plots + CSV summary.  Reference bugs fixed (SURVEY.md
section 7): ``random_seed`` is actually applied, and the function returns
*after* the model loop rather than inside it (reference ``main.py:148``).
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path

import numpy as np

from qkan_implementation_tpu.data.pipeline import DataPipeline
from qkan_implementation_tpu.experiments.config import ExperimentConfig, load_config
from qkan_implementation_tpu.experiments.evaluation import ModelEvaluator, ModelResult
from qkan_implementation_tpu.experiments.visualization import ResultVisualizer
from qkan_implementation_tpu.utils.metrics import compute_metrics
from qkan_implementation_tpu.models.mlp import MLPConfig, mlp_predict, train_mlp
from qkan_implementation_tpu.optim.degree_optimizer import DegreeOptimizer


def setup_logging(config: ExperimentConfig):
    """File + stdout logging named after the experiment (reference :15-25)."""
    log_dir = Path(config.log_path)
    log_dir.mkdir(parents=True, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=[
            logging.FileHandler(log_dir / f"{config.name}.log"),
            logging.StreamHandler(sys.stdout),
        ],
        force=True,
    )


def run_experiment(config_path: str):
    """Run the full experiment described by a YAML config (reference :27-148)."""
    config = load_config(config_path)
    setup_logging(config)
    logger = logging.getLogger(__name__)
    np.random.seed(config.random_seed)  # reference declares but never applies it

    save_dir = Path(config.save_path)
    save_dir.mkdir(parents=True, exist_ok=True)
    from qkan_implementation_tpu.utils.run_records import RunRecorder

    recorder = RunRecorder(save_dir / "runs.jsonl")

    logger.info("Initializing data pipeline...")
    pipeline = DataPipeline(config.data, logger=logger)
    (
        train_df,
        train_target,
        train_weight,
        val_df,
        val_target,
        val_weight,
    ) = pipeline.load_and_preprocess_data()

    results = []
    for model_config in config.models:
        logger.info(f"Training model: {model_config.model_type}")
        for trial in range(config.num_trials):
            start_time = time.time()
            model_params = {}
            if model_config.model_type == "qkan":
                model = DegreeOptimizer(
                    network_shape=model_config.network_shape,
                    max_degree=model_config.max_degree,
                    complexity_weight=(
                        model_config.complexity_weight
                        if model_config.complexity_weight is not None
                        else 0.1
                    ),
                    significance_threshold=(
                        model_config.significance_threshold
                        if model_config.significance_threshold is not None
                        else 0.05
                    ),
                )
                cv_scores = None
                if model_config.degree_cv:
                    cv = dict(model_config.degree_cv)
                    cv_scores, _ = model.evaluate_degree_cv(
                        x_data=train_df,
                        y_data=train_target.to_numpy(),
                        timestamps=pipeline.last_train_dates,
                        weights=train_weight.to_numpy(),
                        n_splits=int(cv.get("n_splits", 5)),
                        strategy=cv.get("strategy", "expanding"),
                    )
                    logger.info(
                        f"CV degree scores ({cv.get('strategy', 'expanding')},"
                        f" {cv.get('n_splits', 5)} folds): {cv_scores}"
                    )
                model.fit(
                    train_df,
                    train_target.to_numpy(),
                    weights=train_weight.to_numpy(),
                    num_reads=(
                        model_config.num_reads
                        if model_config.num_reads is not None
                        else 1000
                    ),
                    seed=config.random_seed + trial,
                    scores=cv_scores,
                )
                optimal_degrees = model.optimal_degrees
                # metrics of the structure the annealer actually SELECTED,
                # from real predictions -- not the best-over-all-degrees
                # score array (which overstated quality whenever the QUBO
                # picked a suboptimal degree), and with the same
                # mse/r2/comp_r2 keys the mlp/fixed_kan branches report
                val_metrics = compute_metrics(
                    val_target.to_numpy(),
                    model.predict(val_df),
                    val_weight.to_numpy(),
                )
                train_metrics = compute_metrics(
                    train_target.to_numpy(),
                    model.predict(train_df),
                    train_weight.to_numpy(),
                )
                model_params = {"degrees": optimal_degrees}
                mse_score = val_metrics["mse"]
                r2_score_val = val_metrics["comp_r2"]
            elif model_config.model_type == "mlp":
                mlp_config = MLPConfig(
                    input_dim=len(config.data.feature_cols),
                    hidden_dims=model_config.hidden_dims or [32],
                    learning_rate=(
                        model_config.learning_rate
                        if model_config.learning_rate is not None
                        else 8e-5
                    ),
                    batch_size=(
                        model_config.batch_size
                        if model_config.batch_size is not None
                        else 32
                    ),
                    n_epochs=(
                        model_config.n_epochs
                        if model_config.n_epochs is not None
                        else 10
                    ),
                )
                scores, compr2_scores, mlp_model = train_mlp(
                    mlp_config,
                    train_df.to_numpy(),
                    train_target.to_numpy(),
                    weights=train_weight.to_numpy(),
                    x_val=val_df.to_numpy(),
                    y_val=val_target.to_numpy(),
                    w_val=val_weight.to_numpy(),
                    seed=config.random_seed + trial,
                )
                n_params = sum(
                    int(np.prod(np.asarray(l["w"]).shape)) + len(np.asarray(l["b"]))
                    for l in mlp_model["params"]["layers"]
                )
                model_params = {"n_parameters": n_params}
                val_pred = np.asarray(mlp_predict(mlp_model, val_df.to_numpy()))
                train_pred = np.asarray(mlp_predict(mlp_model, train_df.to_numpy()))
                val_metrics = compute_metrics(
                    val_target.to_numpy(), val_pred, val_weight.to_numpy()
                )
                train_metrics = compute_metrics(
                    train_target.to_numpy(), train_pred, train_weight.to_numpy()
                )
                # reference-faithful headline: the reference averages the
                # PER-EPOCH validation scores (main.py:116-117), mixing
                # early-epoch losses into MSE_Score -- kept as-is for
                # parity; the final-model numbers are in val_metrics
                mse_score = float(np.average(scores)) if scores else val_metrics["mse"]
                r2_score_val = (
                    float(np.average(compr2_scores))
                    if compr2_scores
                    else val_metrics["comp_r2"]
                )
            elif model_config.model_type == "fixed_kan":
                # multi-layer KAN with QUBO structure search + gradient
                # refinement -- a harness capability beyond the reference's
                # qkan/mlp registry
                from qkan_implementation_tpu.models.fixed_kan import (
                    FixedKAN,
                    FixedKANConfig,
                )

                kan = FixedKAN(
                    FixedKANConfig.preset(
                        model_config.preset or "recommended",
                        network_shape=model_config.network_shape,
                        max_degree=model_config.max_degree or 3,
                        complexity_weight=(
                            model_config.complexity_weight
                            if model_config.complexity_weight is not None
                            else 1e-3
                        ),
                    )
                )
                kan.optimize(
                    train_df.to_numpy(),
                    train_target.to_numpy(),
                    solver="anneal",
                    num_reads=model_config.num_reads or 1000,
                    seed=config.random_seed + trial,
                )
                if model_config.n_epochs:
                    kan.train(
                        train_df.to_numpy(),
                        train_target.to_numpy(),
                        epochs=model_config.n_epochs,
                        batch_size=model_config.batch_size or 256,
                        learning_rate=model_config.learning_rate or 1e-2,
                        loss="mse",
                    )
                val_pred = np.asarray(kan(val_df.to_numpy()))
                train_pred = np.asarray(kan(train_df.to_numpy()))
                val_metrics = compute_metrics(
                    val_target.to_numpy(), val_pred, val_weight.to_numpy()
                )
                train_metrics = compute_metrics(
                    train_target.to_numpy(), train_pred, train_weight.to_numpy()
                )
                model_params = {
                    "degrees": [
                        np.asarray(lp["degrees"]).tolist() for lp in kan.params
                    ]
                }
                mse_score = val_metrics["mse"]
                r2_score_val = val_metrics["comp_r2"]
            else:
                raise ValueError(f"Unknown model_type {model_config.model_type!r}")

            train_time = time.time() - start_time
            results.append(
                ModelResult(
                    model_name=f"{model_config.model_type}_trial_{trial}",
                    MSE_Score=mse_score,
                    R2_Score=r2_score_val,
                    train_time=train_time,
                    model_params=model_params,
                    train_metrics=train_metrics,
                    val_metrics=val_metrics,
                )
            )
            recorder.record(
                experiment=config.name,
                model=model_config.model_type,
                trial=trial,
                mse=mse_score,
                r2=r2_score_val,
                train_time=train_time,
                val_metrics=val_metrics,
            )
            logger.info(f"Trial {trial} complete for {model_config.model_type}")

    logger.info("Creating visualizations...")
    visualizer = ResultVisualizer()
    visualizer.plot_metrics_comparison(results).savefig(
        save_dir / "metrics_comparison.png"
    )
    visualizer.plot_training_time_comparison(results).savefig(
        save_dir / "training_time_comparison.png"
    )
    qkan_results = [r for r in results if "qkan" in r.model_name.lower()]
    if qkan_results:
        visualizer.plot_degree_distribution(qkan_results[0]).savefig(
            save_dir / "degree_distribution.png"
        )

    summary_df = ModelEvaluator.create_evaluation_summary(results)
    summary_df.to_csv(save_dir / "results_summary.csv")
    logger.info("Experiment complete!")
    return results


def _cli():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "config_path", type=str, help="Path to the YAML configuration file"
    )
    args = parser.parse_args()
    run_experiment(args.config_path)


if __name__ == "__main__":
    _cli()
