"""Boolean logic and weighted automata on 2^N tensors
(reference docs/tutorials/logic.ipynb, automata.ipynb)."""

import os

import jax

if os.environ.get("TN_DEVICE", "cpu") == "cpu":
    # f64 analysis mode on CPU; set TN_DEVICE=tpu to run on the accelerator (f32)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import numpy as np

import tntorch_tpu as tn


def main():
    N = 10
    x = tn.symbols(N)

    # Compressed propositional calculus over 2^10 assignments
    f = (x[0] & x[1]) | (~x[2] & x[3]) ^ x[4]
    print("satisfying assignments:", int(round(float(tn.sum(f)))))
    print("is satisfiable:", tn.is_satisfiable(f))
    print("tautology (x | ~x):", tn.is_tautology(x[0] | ~x[0]))
    print("(x&y -> x):", tn.implies(x[0] & x[1], x[0]))
    print("relevant symbols of f:", tn.relevant_symbols(f))

    # Hamming-weight automata
    wm = tn.weight_mask(N, 3)  # accepts strings with exactly three 1s
    print("strings of weight 3:", int(round(float(tn.sum(wm)))), "(C(10,3) = 120)")
    Xs = np.asarray(tn.accepted_inputs(tn.weight_mask(5, 2)))
    print("accepted inputs of weight-2/5 mask:\n", Xs[:5], "...")

    w = tn.weight(N)
    print("weight automaton at 1110000000:", float(w[tuple([1, 1, 1] + [0] * 7)]))


if __name__ == "__main__":
    main()
