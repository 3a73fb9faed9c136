"""MELLM (Mutual Evaluation of LLMs) — port of the reference's scoring
core (/root/reference/jionlp/algorithm/mellm/mellm.py:20-453).

The reference has three stages:

1. ``answer_questions`` — N llms answer M questions and grade each
   other's answers over NETWORK APIs (:163-210).  Out of scope in a
   sandboxed engine; here the grading responses are an INPUT table (the
   stub boundary, like the multimodal decoders — swap a real API client
   in to produce the same table).
2. Grade-string normalization ('4 分', '四分。', '四点五 分' → float).
   The reference ships this in a rough state: ``normalize_grading_result``
   (:213-237) references attributes that don't exist
   (``self.money_parser``, ``self.llm_answers_to_norm_grades``) and
   ``norm_test`` (:239-276) prints instead of returning — so
   ``normalize_grading_score`` below implements the documented intent
   (GRADING_NUM_PATTERN scan → MoneyParser → float, with the 点-split
   branch accepting only .5 fractions) and is tested directly.
3. The EM-style mutual-weighting iterations ``run_whole`` (:287-358) and
   ``run_singular`` (:360-453) — pure numpy, ported exactly (parity
   asserted against the reference class in tests/test_mellm.py).
"""

from __future__ import annotations

import re

import numpy as np

from .money import MoneyParseError, MoneyParser

# reference rule_pattern.py:129
GRADING_NUM_PATTERN = re.compile(
    r'[\.点0-9一二三四五六七八九壹弌贰弍叁弎仨肆伍陆柒捌玖俩两零〇'
    r'十百千万亿兆拾佰仟萬億]+')


def normalize_grading_score(grading_result: str,
                            money_parser: MoneyParser | None = None
                            ) -> float:
    """'4 分' / '四分。' / '4.5' / '四点五 分' → float score.

    Raises ValueError when no score substring is found, the number does
    not parse, or a 点-fraction is not exactly .5 (reference norm_test
    :239-276 semantics — the reference only supports half-point scores
    in Chinese-numeral form)."""
    mp = money_parser if money_parser is not None else MoneyParser()
    m = GRADING_NUM_PATTERN.search(grading_result)
    if m is None:
        raise ValueError(
            f'grading_result `{grading_result}` is invalid.')

    def _num(s: str) -> float:
        try:
            return float(mp.parse(s)['num'])
        except MoneyParseError as e:
            raise ValueError(
                f'grading_result `{grading_result}` is invalid.') from e

    grading_string = m.group()
    if '点' not in grading_string:
        return _num(grading_string)
    parts = grading_string.split('点')
    if len(parts) != 2:
        raise ValueError(
            f'grading_result `{grading_result}` with 点 is invalid.')
    norm_score = _num(parts[0])
    frac = int(_num(parts[1]))
    if frac != 5:
        raise ValueError(
            f'grading_result `{grading_result}` with 0.5 is invalid.')
    return norm_score + frac / 10


def run_whole(grading_matrix: np.ndarray,
              grading_error_count: np.ndarray,
              stop_criteria: float = 1e-5, max_epoch: int = 20,
              average_score_granularity: int = 4) -> dict:
    """Reference MELLM.run_whole (:287-358), exact numpy port.

    grading_matrix[i, j, q] = score grader i gave llm j on question q
    (diagonal i == j stays 0 — the reference never self-grades and its
    uniform average INCLUDES the zero diagonal, a quirk preserved here).

    → {'total_score', 'weight', 'average_scores', 'variance', 'epochs'}
    """
    llm_num, _n, question_num = grading_matrix.shape
    llm_average_scores = np.zeros((llm_num, question_num))
    weight_matrix = np.ones((llm_num,)) / llm_num
    last_weight_matrix = np.zeros((llm_num,))
    total_score = np.zeros((llm_num,))
    llm_variance = np.zeros((llm_num,))

    epoch_num = 0
    while True:
        epoch_num += 1
        for j in range(llm_num):
            for q in range(question_num):
                average_result = np.dot(weight_matrix,
                                        grading_matrix[:, j, q])
                average_result = (round(average_result
                                        * average_score_granularity)
                                  / average_score_granularity)
                llm_average_scores[j][q] = average_result

        for j in range(llm_num):
            total_score[j] = sum(llm_average_scores[j])

        for i in range(llm_num):
            diff = grading_matrix[i] - llm_average_scores
            variance = (diff * diff).sum()
            variance = variance / (
                1 - grading_error_count[i] / (question_num * llm_num))
            llm_variance[i] = variance

        weight_matrix_1 = (1 / llm_variance) / (1 / llm_variance).sum()
        weight_matrix_2 = total_score - total_score.min()
        weight_matrix_2 = weight_matrix_2 / weight_matrix_2.sum()
        weight_matrix = (weight_matrix_1 + weight_matrix_2) / 2

        diff = last_weight_matrix - weight_matrix
        weight_gap = (diff * diff).sum()
        need_to_stop = (weight_gap < stop_criteria
                        or epoch_num > max_epoch)
        last_weight_matrix = weight_matrix
        if need_to_stop:
            break

    return {'total_score': total_score, 'weight': weight_matrix,
            'average_scores': llm_average_scores,
            'variance': llm_variance, 'epochs': epoch_num}


def run_singular(grading_matrix: np.ndarray,
                 grading_error_count: np.ndarray,
                 stop_criteria: float = 1e-5, max_epoch: int = 20,
                 average_score_granularity: int = 4,
                 learning_rate: float = 0.05) -> dict:
    """Reference MELLM.run_singular (:360-453), exact numpy port —
    per-(llm, question) weight tensors updated by squared-gap descent.

    → {'total_score', 'weight', 'average_scores', 'variance', 'epochs'}
    """
    llm_num, _n, question_num = grading_matrix.shape
    llm_average_scores = np.zeros((llm_num, question_num))
    weight_matrix = np.ones((llm_num,)) / llm_num
    total_score = np.zeros((llm_num,))
    llm_variance = np.zeros((llm_num,))
    last_weight_matrix_singular = np.zeros(
        (llm_num, llm_num, question_num))
    weight_matrix_singular = (np.ones((llm_num, llm_num, question_num))
                              / llm_num)

    epoch_num = 0
    while True:
        epoch_num += 1
        for j in range(llm_num):
            for q in range(question_num):
                cur_weight = weight_matrix_singular[:, j, q]
                all_results = grading_matrix[:, j, q]
                average_result = np.dot(cur_weight, all_results)
                average_result = (round(average_result
                                        * average_score_granularity)
                                  / average_score_granularity)
                llm_average_scores[j][q] = average_result

                diff = all_results - average_result
                gap_power_2 = diff * diff
                cur_weight -= gap_power_2 * learning_rate
                cur_weight[cur_weight < 0] = 0
                cur_weight /= cur_weight.sum()

        for j in range(llm_num):
            total_score[j] = sum(llm_average_scores[j])

        for i in range(llm_num):
            diff = grading_matrix[i] - llm_average_scores
            variance = (diff * diff).sum()
            variance = variance / (
                1 - grading_error_count[i] / (question_num * llm_num))
            llm_variance[i] = variance

        for j in range(llm_num):
            for q in range(question_num):
                cur_weight = weight_matrix_singular[:, j, q]
                weight_matrix_2 = total_score - total_score.min()
                weight_matrix_2 = weight_matrix_2 / weight_matrix_2.sum()
                weight_matrix_singular[:, j, q] = (
                    (cur_weight + weight_matrix_2) / 2)

        diff = last_weight_matrix_singular - weight_matrix_singular
        weight_gap = (diff * diff).sum()
        need_to_stop = (weight_gap < stop_criteria
                        or epoch_num > max_epoch)
        # reference quirk preserved (:441): the loop assigns the singular
        # tensor to ``last_weight_matrix`` (the WHOLE-mode attribute), so
        # ``last_weight_matrix_singular`` stays zero and the gap check
        # never converges — singular mode always runs max_epoch+1 epochs
        if need_to_stop:
            break

    for i in range(llm_num):
        weight_matrix[i] = weight_matrix_singular[i].sum()
    weight_matrix /= weight_matrix.sum()

    return {'total_score': total_score, 'weight': weight_matrix,
            'average_scores': llm_average_scores,
            'variance': llm_variance, 'epochs': epoch_num}
