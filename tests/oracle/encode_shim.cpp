// Oracle shim: drive the *reference* encoder (headers at -I) on raw input.
//
// Usage: encode_shim <dtype> <block> <nframes> <size> [d0 d1 ...]
//   stdin:  nframes*size native-endian values of <dtype>
//   stdout: the full .trpx byte stream as Terse::write emits it
//
// This compiles against the unmodified reference headers purely as a test
// oracle; nothing from it ships in the trpx_tpu package.

#include <cmath>
#include <bit>
#include <cstdint>
#include <iostream>
#include <string>
#include <vector>

#include "Terse.hpp"

template <typename T>
int run(unsigned block, size_t nframes, size_t size, std::vector<size_t> dims) {
    std::vector<T> buf(size);
    jpa::Terse* t = nullptr;
    for (size_t f = 0; f < nframes; ++f) {
        std::cin.read(reinterpret_cast<char*>(buf.data()), size * sizeof(T));
        if (!std::cin) { std::cerr << "short read\n"; return 2; }
        if (!t)
            t = new jpa::Terse(buf.begin(), size, block);
        else
            t->push_back(buf.begin(), size);
    }
    if (!dims.empty()) t->dim(dims);
    t->write(std::cout);
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 5) { std::cerr << "usage: encode_shim dtype block nframes size [dims...]\n"; return 1; }
    std::string dt = argv[1];
    unsigned block = std::stoul(argv[2]);
    size_t nframes = std::stoull(argv[3]);
    size_t size = std::stoull(argv[4]);
    std::vector<size_t> dims;
    for (int i = 5; i < argc; ++i) dims.push_back(std::stoull(argv[i]));
    if (dt == "u8") return run<std::uint8_t>(block, nframes, size, dims);
    if (dt == "u16") return run<std::uint16_t>(block, nframes, size, dims);
    if (dt == "u32") return run<std::uint32_t>(block, nframes, size, dims);
    if (dt == "u64") return run<std::uint64_t>(block, nframes, size, dims);
    if (dt == "i8") return run<std::int8_t>(block, nframes, size, dims);
    if (dt == "i16") return run<std::int16_t>(block, nframes, size, dims);
    if (dt == "i32") return run<std::int32_t>(block, nframes, size, dims);
    if (dt == "i64") return run<std::int64_t>(block, nframes, size, dims);
    std::cerr << "unknown dtype " << dt << "\n";
    return 1;
}
