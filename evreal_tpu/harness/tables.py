"""Score table printing (reference eval.py:279-303) with simple ANSI colors
(the reference uses yachalk, absent here)."""

from tabulate import tabulate


def _ansi(code):
    return lambda s: f"\033[{code}m{s}\033[0m"


color_progress = _ansi("1;36")
color_error = _ansi("1;31")
color_scores = _ansi("1;32")
_underline = _ansi("4")


def print_scores(all_metrics, method_names, dataset_names, config_name):
    scores_table = []
    headers = ["\nMethod"]
    for method_name, method_metrics in zip(method_names, all_metrics):
        weighted_averages = []
        for dataset_name, dataset_metrics in zip(dataset_names,
                                                 method_metrics):
            for idx, metric in enumerate(dataset_metrics.keys()):
                if idx == 0:
                    num_eval = dataset_metrics.get_count(metric)
                    headers.append(dataset_name + f" ({num_eval})" + "\n" +
                                   metric.upper())
                else:
                    headers.append("\n" + metric.upper())
                weighted_averages.append(dataset_metrics.get_average(metric))
        scores_table.append([method_name] + weighted_averages)
    print("")
    print(_underline(color_scores(
        f"Image Quality Scores (for {config_name} config)")))
    print(color_scores(tabulate(scores_table, headers=headers,
                                floatfmt=".3f")))
    print("")
